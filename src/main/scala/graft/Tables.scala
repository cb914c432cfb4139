package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (/root/repo/TESTDATA.md). One parquet file per table under `sfDir`.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver's events.ts is parquet TIMESTAMP(NANOS) which
      // Spark's vectorized reader rejects; read it as a long and
      // convert to a µs timestamp (values are whole milliseconds, so
      // the DIV is lossless). A rewritten events table (MakeSf's
      // scaled copies) carries an ordinary µs timestamp instead —
      // nanosAsLong does not touch that type, so convert only when
      // the column actually surfaced as a long.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else df
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
