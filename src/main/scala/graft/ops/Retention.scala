package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K5 of SURVEY.md §2b: the reference's 15-day retention delete
  * (/root/reference/Cleanup-job/sp_raw_cleanup_15days_older_data_query.sql:2
  * — `DELETE FROM hourly WHERE dt <= CURRENT_DATE() - 15`, invoked from
  * Cleanup-job/main.py:44-47).
  *
  * `asOf` is injected instead of wall-clock `CURRENT_DATE()` so runs are
  * deterministic and oracle-checkable (SURVEY.md §7 hard parts). The
  * boundary is inclusive on the delete side: rows with `dt == asOf - 15`
  * are dropped; we KEEP strictly `dt > asOf - 15`.
  *
  * Scale path: when the raw table is stored partitioned by `dt`
  * (as [[graft.streaming.Ingest]] writes it), retention is a pure
  * partition drop — O(#expired-partitions) filesystem deletes, zero data
  * read or rewritten. That is the 100 TB-correct shape; the predicate
  * rewrite below is only the fallback for unpartitioned inputs.
  */
object Retention {
  val DefaultDays = 15

  /** Relational form: rows surviving retention. */
  def keep(raw: DataFrame, asOf: Column, days: Int = DefaultDays): DataFrame =
    raw.filter(col("dt") > date_sub(asOf, days))

  /** Partition-drop form for a dt-partitioned parquet table: deletes
    * `dt=<d>` directories with d <= asOf - days. No data is scanned.
    */
  def dropExpiredPartitions(
      spark: SparkSession, tablePath: String, asOf: java.sql.Date,
      days: Int = DefaultDays): Seq[String] = {
    val cutoff = asOf.toLocalDate.minusDays(days.toLong)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("dt=") &&
          (java.time.LocalDate.parse(p.getName.stripPrefix("dt="))
            .compareTo(cutoff) <= 0)
      }
      .map { p => fs.delete(p, true); p.getName }
  }
}
