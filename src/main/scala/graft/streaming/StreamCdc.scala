package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC state view — ops/Cdc's latest-change-per-key collapse
  * maintained INCREMENTALLY over an unbounded change stream
  * (`mapGroupsWithState`): each micro-batch folds its changes into a
  * one-record-per-key state and re-emits the key's current row, so
  * downstream sees a live SCD1 dimension instead of re-collapsing the
  * whole log per trigger (the same recompute-vs-maintain upgrade
  * StreamRollup makes for the daily rollup).
  *
  * Contract mirrors the batch op: `seq` must totally order a key's
  * changes (ties are nondeterministic — same as Cdc.applyLatest's
  * ordering requirement); a key whose latest change is a delete is
  * EMITTED with its op so consumers can tombstone it — filtering
  * `op != "D"` yields exactly the batch `applyLatest` view
  * (StreamCdcSpec proves row equality on the same log).
  *
  * Scale posture: state is ONE record per live key, hash-partitioned
  * on the key — no log retention in the store, no per-batch shuffle of
  * history. Update output mode: only keys touched by a batch re-emit.
  */
object StreamCdc {

  final case class Change(key: Long, seq: Long, op: String, payload: Double)
  final case class CdcState(seq: Long, op: String, payload: Double, n: Long)
  final case class Latest(
      key: Long, seq: Long, op: String, payload: Double, n_changes: Long)

  def latestState(changes: Dataset[Change]): Dataset[Latest] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[CdcState, Latest](GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[CdcState]) =>
          var s = state.getOption.getOrElse(
            CdcState(Long.MinValue, "", 0.0, 0L))
          it.foreach { c =>
            // n == 0 marks the empty state — no sentinel comparison, so
            // a change carrying seq == Long.MinValue still applies
            s =
              if (s.n == 0L || c.seq > s.seq)
                CdcState(c.seq, c.op, c.payload, s.n + 1)
              else s.copy(n = s.n + 1)
          }
          state.update(s)
          Latest(key, s.seq, s.op, s.payload, s.n)
      }
  }

  /** foreachBatch writer: merge each micro-batch of [[latestState]]
    * emissions into a durable hash-partitioned parquet table — the
    * MERGE INTO a bare-directory layout can express. Keys hash into
    * `buckets` partitions; a batch rewrites ONLY the partitions its
    * keys touch (read touched → drop updated keys → union survivors),
    * so the write cost is O(touched buckets), not O(table). Tombstones
    * (op == deleteOp) remove the key.
    *
    * Commit protocol (staged-manifest; closes the round-6 advice
    * finding that overwrite-in-place could lose untouched keys if a
    * crash landed mid-commit): the merged partitions are written to a
    * hidden staging dir under the table root (dot-prefixed, so table
    * reads never list it), the COMMIT POINT is an atomic rename of a
    * per-partition manifest into the staging dir, and only then are
    * touched `part=` dirs swapped live one directory-rename at a time.
    * Every live partition is therefore always a complete old or
    * complete new directory, never a partial write. A crash before the
    * manifest rename discards the staging dir on replay and re-merges
    * from the intact live table; a crash after it is completed by
    * replay FROM THE MANIFEST (foreachBatch re-delivers the same
    * batchId after restart, and the staged data for that batch is
    * already the correct post-merge state). Cross-partition atomicity
    * is per-swap — a reader between two swaps of the same batch can see
    * partition A new and partition B old, which is the same visibility
    * a multi-file dynamic overwrite has; single-writer is assumed (see
    * [[graft.ops.SingleWriter]]).
    *
    * Usage: `latestState(cs).writeStream.foreachBatch(
    *   StreamCdc.mergeInto(path) _)...`
    */
  def mergeInto(path: String, buckets: Int = 8, deleteOp: String = "D")(
      batch: Dataset[Latest], batchId: Long): Unit = {
    val spark: SparkSession = batch.sparkSession
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.ops.SingleWriter.withLock(fs, dir) {
      mergeLocked(spark, batch, batchId, dir, fs, buckets, deleteOp)
    }
  }

  private def mergeLocked(
      spark: SparkSession, batch: Dataset[Latest], batchId: Long,
      dir: Path, fs: org.apache.hadoop.fs.FileSystem,
      buckets: Int, deleteOp: String): Unit = {
    val path = dir.toString
    val staging = new Path(dir, s".staging_b$batchId")
    val manifest = new Path(staging, MANIFEST)
    if (fs.exists(manifest)) {
      // Prior attempt of THIS batch crashed after its commit point:
      // the staged merge is complete and authoritative — finish the
      // swap; re-merging against a half-swapped table would be wrong.
      finishSwap(fs, dir, staging)
      return
    }
    fs.delete(staging, true) // uncommitted leftover from a crashed run
    val upd = batch.toDF()
      .withColumn("part", pmod(hash(col("key")), lit(buckets)))
      // a key may re-emit across this batch's state updates; keep the
      // latest emission (highest n_changes) per key
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("n_changes").desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .cache()
    try {
      val touched = upd.select(col("part")).distinct()
        .collect().toIndexedSeq.map(_.getInt(0)) // bounded: ≤ buckets rows
      if (touched.nonEmpty) {
        // "Table exists" must mean HAS DATA, not "dir exists": a crash
        // during a first batch's staging write leaves the root dir
        // created but empty, and reading it as parquet throws on every
        // replay — wedging the stream permanently.
        val hasData = fs.exists(dir) && fs.listStatus(dir)
          .exists(_.getPath.getName.startsWith("part="))
        val current =
          if (hasData)
            spark.read.parquet(path).filter(col("part").isin(touched: _*))
          else upd.limit(0)
        // Materialized by the staging write below — the live table is
        // only read here and only renamed after the write completes,
        // so the read-your-own-overwrite hazard is gone by layout.
        current
          .join(upd.select(col("key")).distinct(), Seq("key"), "left_anti")
          .unionByName(upd.filter(!(col("op") <=> lit(deleteOp))))
          .write.partitionBy("part").mode("overwrite")
          .parquet(staging.toString)
        // Partitions with zero survivors produce no staged dir but
        // their live dir must still drop — record keep/drop per touched
        // partition, then commit via atomic manifest rename.
        val staged = fs.listStatus(staging)
          .map(_.getPath.getName).filter(_.startsWith("part="))
          .map(_.stripPrefix("part=").toInt).toSet
        val lines = touched.sorted.map { p =>
          s"$p ${if (staged(p)) "keep" else "drop"}"
        }.mkString("", "\n", "\n")
        val tmp = new Path(staging, MANIFEST + ".tmp")
        val out = fs.create(tmp, true)
        try out.write(lines.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, manifest))
          throw new java.io.IOException(s"manifest commit failed: $manifest")
        finishSwap(fs, dir, staging)
      }
    } finally upd.unpersist()
  }

  private val MANIFEST = "_touched"

  /** Complete a committed merge: swap each manifest-listed partition
    * live (delete-then-rename, each step idempotent under replay — a
    * staged dir already renamed by a crashed attempt reads as `keep`
    * with no staged source, i.e. a no-op), then drop the staging dir.
    */
  private def finishSwap(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path, staging: Path): Unit = {
    val manifest = new Path(staging, MANIFEST)
    val in = fs.open(manifest)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    lines.filter(_.nonEmpty).foreach { line =>
      val Array(p, action) = line.split(" ", 2)
      val live = new Path(dir, s"part=$p")
      val staged = new Path(staging, s"part=$p")
      if (action == "drop") fs.delete(live, true)
      else if (fs.exists(staged)) {
        fs.delete(live, true)
        if (!fs.rename(staged, live))
          throw new java.io.IOException(s"swap failed: $staged -> $live")
      } // keep with no staged dir = already swapped by a prior attempt
    }
    fs.delete(staging, true)
  }
}
