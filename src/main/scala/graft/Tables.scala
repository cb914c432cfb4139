package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (/root/repo/TESTDATA.md). One parquet file per table under `sfDir`.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as a long and convert to a µs timestamp
      // (values are whole milliseconds, so the DIV is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
