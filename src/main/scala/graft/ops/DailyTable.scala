package graft.ops

import java.sql.Date

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K3/K4/D1/D2 of SURVEY.md §2: lifecycle of the daily rollup table.
  *
  * The reference keeps the daily table partitioned by month
  * (`PARTITION BY DATE_TRUNC(dt, MONTH)`, create sql:22-23) and maintains
  * it two ways, chosen by a table-existence probe
  * (/root/reference/Load-gcs-to-bq/main.py:87-91):
  *  - absent  → sp_create: CREATE OR REPLACE + full-history insert;
  *  - present → sp_update: DELETE today's row, re-INSERT today's rollup
  *    (update sql:2,4-36) — a delete-then-insert upsert of one date.
  *
  * Spark mapping: monthly-partitioned parquet; bootstrap is a partitioned
  * overwrite; upsert is a *dynamic* partition overwrite that rewrites only
  * the month partition containing `asOf` (sibling days of that month are
  * carried over, all other months untouched). At scale the rewrite cost is
  * one month of daily rows — at most 31 rows per location — regardless of
  * table size, and readers prune on `month_part` exactly like BigQuery's
  * partition pruning.
  */
object DailyTable {
  val PartitionCol = "month_part"

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def withMonth(daily: DataFrame): DataFrame =
    daily.withColumn(PartitionCol, trunc(col("dt"), "month"))

  /** Full rebuild (sp_create analogue). */
  def bootstrap(hourly: DataFrame, path: String): Unit =
    withMonth(DailyRollup.rollup(hourly))
      .write.partitionBy(PartitionCol).mode("overwrite").parquet(path)

  /** One-day delete-then-insert upsert (sp_update analogue), implemented
    * as dynamic partition overwrite of the single affected month.
    * Idempotent: re-running for the same `asOf` converges to the same
    * table (the reference's WRITE_APPEND double-count bug is not
    * reproduced; see SURVEY.md §2 bug list).
    */
  def upsert(spark: SparkSession, hourly: DataFrame, path: String, asOf: Date): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val monthPart = Date.valueOf(asOf.toLocalDate.withDayOfMonth(1))
    // Sibling days of the affected month survive the partition rewrite.
    // localCheckpoint materializes them BEFORE the overwrite deletes the
    // files they came from (self-overwrite hazard).
    val siblings = spark.read.parquet(path)
      .filter(col(PartitionCol) === lit(monthPart) && col("dt") =!= lit(asOf))
      .localCheckpoint(true)
    val fresh = withMonth(DailyRollup.rollup(hourly, Some(asOf)))
    siblings.unionByName(fresh)
      .write.partitionBy(PartitionCol).mode("overwrite").parquet(path)
  }

  /** The existence branch of Load-gcs-to-bq/main.py:87-91. */
  def sync(spark: SparkSession, hourly: DataFrame, path: String, asOf: Date): Unit =
    if (exists(spark, path)) upsert(spark, hourly, path, asOf)
    else bootstrap(hourly, path)
}
