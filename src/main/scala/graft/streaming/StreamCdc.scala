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
    * keys touch (read touched → drop updated keys → union survivors,
    * dynamic partition overwrite), so the write cost is O(touched
    * buckets), not O(table). Tombstones (op == deleteOp) remove the
    * key; a touched partition whose survivors all vanish is deleted
    * explicitly (dynamic overwrite cannot emit an empty partition).
    * The merge is idempotent — replaying a batch reproduces the same
    * table state — which is what makes foreachBatch's at-least-once
    * delivery exactly-once at the table level.
    *
    * Usage: `latestState(cs).writeStream.foreachBatch(
    *   StreamCdc.mergeInto(path) _)...`
    */
  def mergeInto(path: String, buckets: Int = 8, deleteOp: String = "D")(
      batch: Dataset[Latest], batchId: Long): Unit = {
    val spark: SparkSession = batch.sparkSession
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
        .collect().map(_.getInt(0)) // bounded: ≤ buckets rows
      if (touched.nonEmpty) {
        val dir = new Path(path)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val current =
          if (fs.exists(dir))
            spark.read.parquet(path).filter(col("part").isin(touched: _*))
          else upd.limit(0)
        val merged = current
          .join(upd.select(col("key")).distinct(), Seq("key"), "left_anti")
          .unionByName(upd.filter(!(col("op") <=> lit(deleteOp))))
          .cache()
        try {
          merged.write
            .partitionBy("part")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
          // dynamic overwrite skipped any touched partition left with
          // zero survivors — its stale files must go explicitly
          val stillThere =
            merged.select(col("part")).distinct().collect().map(_.getInt(0)).toSet
          touched.filterNot(stillThere).foreach { p =>
            fs.delete(new Path(dir, s"part=$p"), true)
          }
        } finally merged.unpersist()
      }
    } finally upd.unpersist()
  }
}
