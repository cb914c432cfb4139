package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{DailyTable, LogEvent, LogEvents}
import graft.schema.WeatherSchema

/** E1 — the reference's flagship event-driven path (SURVEY.md §3),
  * re-expressed as Structured Streaming:
  *
  * {{{
  * GCS bucket + object-finalize trigger   →  file-source stream over a
  *   (Load-gcs-to-bq/main.py:56-64)          landing dir (S3): each new
  *                                           NDJSON file = one input
  * BQ load job, WRITE_APPEND (K2,         →  foreachBatch: append batch
  *   main.py:74-84)                          to dt-partitioned raw parquet
  * CALL sp_create / sp_update (D2/D3,     →  DailyTable.sync per affected
  *   main.py:87-92)                          day, AFTER the append lands
  * }}}
  *
  * Two reference bugs intentionally not reproduced (SURVEY.md §2 list):
  *  - CF#2 fires the transform without awaiting the load job
  *    (`load_job.result()` never called) — here the rollup runs strictly
  *    after the raw append within the same micro-batch;
  *  - replayed GCS events double-append rows — the file source's
  *    checkpoint processes each landing file exactly once, so re-running
  *    the stream re-ingests nothing.
  *
  * Scale posture: the raw table is written `partitionBy(dt)`, so (a) the
  * per-day rollup scan prunes to one day's files, (b) retention (K5) is
  * a pure partition drop, and (c) the only driver-side collect is the
  * distinct `dt` list of one micro-batch — bounded by days-per-batch,
  * independent of batch row count.
  */
object Ingest {

  /** Process everything currently in the landing dir, then stop
    * (`Trigger.AvailableNow` — the batch-ish analogue of the reference's
    * per-event invocation; swap for `Trigger.ProcessingTime` in a
    * long-running deployment).
    */
  def runOnce(
      spark: SparkSession, landingDir: String, rawPath: String,
      dailyPath: String, checkpointDir: String,
      logRoot: Option[String] = None): Unit = {
    val stream = spark.readStream
      .schema(WeatherSchema.raw)
      .json(landingDir)
    val query = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, batchId, rawPath, dailyPath, logRoot)
      }
      .start()
    query.awaitTermination()
  }

  /** §2j: the success/error envelope every reference function publishes
    * (Load-gcs-to-bq/main.py:96-110), emitted per micro-batch.
    */
  private def publishLog(
      spark: SparkSession, logRoot: Option[String], messageType: String,
      message: String): Unit =
    logRoot.foreach { root =>
      import spark.implicits._
      LogEvents.append(Seq(LogEvent(
        project = "graft", service = "ingest", process = "ingest_batch",
        runtime = s"spark ${spark.version}", log_type = LogEvents.BqLoadLogging,
        file_name = None, gcs_uri = None, bq_uri = None,
        message_type = messageType, message = message)).toDS(), root)
    }

  /** One micro-batch: K2 append, then D2/D3 transform per affected day —
    * sequential within the batch (the ordering CF#2 gets wrong).
    *
    * The "append" is a dynamic overwrite of the batch's own
    * (dt, ingest_batch=<id>) partitions: a retried batch (crash after
    * the write, before the checkpoint commit) rewrites the same
    * directories instead of appending duplicates, upgrading the path
    * from at-least-once to effectively-once. `dt` stays the leading
    * partition level, so day-pruning and retention partition drops see
    * the same top-level layout.
    */
  private[graft] def ingestBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long, rawPath: String,
      dailyPath: String, logRoot: Option[String] = None): Unit = {
    batch.persist()
    try {
      // Malformed landing lines parse to all-null rows under the explicit
      // schema (PERMISSIVE mode); a null dt would land in the Hive
      // default partition and silently poison the rollup's null group —
      // quarantine them to a count instead of ingesting.
      val good = batch.filter(col("dt").isNotNull)
      // One conditional aggregate (count(col) skips nulls) instead of
      // batch.count() - good.count(): same number, one job launch per
      // micro-batch rather than two over the cached batch.
      val counts = batch
        .agg(count(lit(1)).as("total"), count(col("dt")).as("with_dt"))
        .head()
      val malformed = counts.getLong(0) - counts.getLong(1)
      good.withColumn("ingest_batch", lit(batchId))
        .write.partitionBy("dt", "ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(rawPath)
      val days = good.select(col("dt")).distinct().collect()
        .map(_.getAs[Date]("dt")).sorted
      if (days.nonEmpty) {
        // dt is now a partition column of the raw store; per-day scope
        // filters in DailyRollup prune to one day's directory.
        val raw = spark.read.parquet(rawPath)
        if (!DailyTable.exists(spark, dailyPath))
          DailyTable.bootstrap(raw, dailyPath) // covers every day at once
        else
          days.foreach(d => DailyTable.upsert(raw, dailyPath, d))
      }
      publishLog(spark, logRoot, "success",
        s"batch $batchId loaded, days=${days.mkString(",")}, malformed=$malformed")
    } catch {
      case e: Throwable =>
        publishLog(spark, logRoot, "error",
          s"batch $batchId failed: ${e.getMessage}")
        throw e
    } finally batch.unpersist()
  }
}
