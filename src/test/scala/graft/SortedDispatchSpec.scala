package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dispatch
import graft.queries.Sorted

class SortedDispatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Sorted.byKey: globally ordered output, explicit partition count") {
    val df = Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 0L).toDF("k")
      .withColumn("v", col("k") * 10)
    val out = Sorted.byKey(df, col("k"))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "explicit count must survive AQE (no coalescing to 1)")
    // row order as read back (partition index, then position) is the
    // global key order — the property the oracle compare relies on
    val keys = out.select("k").collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted)
  }

  test("Sorted.byKey: order survives a downstream row-wise projection") {
    val df = Seq(3L, 1L, 2L).toDF("k")
    val projected = Sorted.byKey(df, col("k"))
      .select((col("k") * 100).as("k100"), lit("x").as("tag"))
    assert(projected.select("k100").collect().map(_.getLong(0)).toSeq
      == Seq(100L, 200L, 300L))
  }

  test("Dispatch: timestamped names clean to the stem; unmapped are dropped") {
    val files = Seq(
      "hourly-weather-data-json-20220830-14:30:00.json", // mapped
      "hourly-weather-data-json-19990101-00:00:00.json", // mapped
      "mystery-export-json-20220830-14:30:00.json",      // unmapped → drop
      "no-timestamp-file.csv")                           // unmapped → drop
      .toDF("file_name")
    val out = Dispatch.dispatch(files, "file_name")
      .select("stem", "target_table").distinct().collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "hourly-weather-data")
    assert(out.head.getString(1) == "weather-data-hourly")
  }

  test("Dispatch.commandGate keeps only the matching decoded command") {
    val b64 = java.util.Base64.getEncoder
    def enc(s: String) = b64.encodeToString(s.getBytes("UTF-8"))
    val cmds = Seq(enc("collect-weather-data"), enc("other-cmd"), enc(""))
      .toDF("payload")
    val kept = Dispatch.commandGate(cmds, "payload", "collect-weather-data")
    assert(kept.count() == 1)
  }
}
