package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{AnnIndex, KMeansLite}

/** Streaming incremental kNN-graph maintenance — the production form
  * of x75 (the x42 persisted-index discipline on x73's plan): vector
  * batches arrive on a stream, each batch probes a FROZEN coarse
  * quantizer, and only the cells the batch touches have their edge
  * lists recomputed and overwritten. Between batches the index lives
  * entirely on disk: a persisted assignments table (vec_id, v, cell)
  * and a cell-partitioned edge table.
  *
  * Scale posture per micro-batch:
  *  - assignment of the batch is a narrow map against the broadcast
  *    centroid literal (corpus-independent);
  *  - the refresh reads ONLY the touched-cell slice of the persisted
  *    assignments (the touched spine broadcasts — AnnIndex
  *    .incrementalNeighborsAssigned), so work is O(touched-cell
  *    population), not O(corpus);
  *  - the edge write is a DYNAMIC partition overwrite on `cell` (the
  *    K4 upsert discipline): exactly the touched partitions are
  *    replaced, untouched cells keep their previous edge lists
  *    byte-for-byte;
  *  - centroids stay frozen (index rebuilds are an offline decision —
  *    refitting online would silently move cell boundaries and
  *    invalidate every persisted assignment).
  *
  * RoundTenSpec's batch-level identity (incremental == frozen full
  * recompute on touched cells) is the per-batch correctness law;
  * StreamKnnSpec replays it across micro-batches against the on-disk
  * tables.
  */
object StreamKnn {

  /** Assign a (vec_id, v) frame to frozen cells. */
  def withCell(vecs: DataFrame, cents: Seq[Seq[Double]]): DataFrame =
    vecs.select(col("vec_id"), col("v"),
      KMeansLite.assign(col("v"), cents).as("cell"))

  /** One micro-batch of maintenance against the on-disk index. */
  private[graft] def maintainBatch(
      spark: SparkSession, batch: DataFrame, cents: Seq[Seq[Double]],
      statePath: String, edgesPath: String, topK: Int): Unit = {
    val newAssigned = withCell(batch, cents).persist()
    try {
      if (newAssigned.isEmpty) return
      val oldAssigned = spark.read.parquet(statePath)
        .select(col("vec_id"), col("v"), col("cell"))
      val refreshed = AnnIndex.incrementalNeighborsAssigned(
        oldAssigned, newAssigned, topK)
      // carry the src cell so the write can replace exactly the
      // touched-cell partitions; the assignment side of this join is
      // already restricted to touched cells inside the refresh, and
      // here the edge rows are, so the join is touched-sized
      val cellOf = oldAssigned.unionByName(newAssigned)
        .select(col("vec_id").as("src_id"), col("cell"))
      refreshed.join(cellOf, "src_id")
        .write.partitionBy("cell")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(edgesPath)
      // the batch joins the persisted corpus AFTER its edges exist —
      // a replayed batch re-derives the same cells and re-overwrites
      // the same partitions (idempotent), then re-appends; exact-once
      // state append rides the streaming checkpoint, as in Ingest
      newAssigned.write.mode("append").parquet(statePath)
    } finally newAssigned.unpersist()
  }

  /** Attach maintenance to a streaming (vec_id, v) frame. The seed
    * corpus must already sit at `statePath` (assignments) with its
    * edges at `edgesPath` — build both once offline via [[withCell]] +
    * [[AnnIndex.knnGraphAssigned]].
    */
  def maintain(
      batches: DataFrame, cents: Seq[Seq[Double]],
      statePath: String, edgesPath: String, topK: Int,
      checkpoint: String): StreamingQuery =
    batches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        maintainBatch(b.sparkSession, b.toDF(), cents,
          statePath, edgesPath, topK)
      }
      .start()
}
