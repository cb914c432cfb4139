package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime half of the skew story (SURVEY §4): q20 demonstrates
  * MANUAL salting under the oracle; this spec demonstrates AQE's
  * runtime skew-join re-plan — the hot partition is split at execution
  * time once its size crosses the thresholds, visible as
  * `SortMergeJoin(skew=true)` over a skewed `AQEShuffleRead`.
  */
class AqeSkewSpec extends AnyFunSuite {
  // own session: runtime-conf mutations (broadcast threshold, skew
  // thresholds) must never leak into — or race with — other suites
  // sharing TestSpark's session
  lazy val spark = TestSpark.spark.newSession()

  test("AQE splits a skewed join partition at runtime") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    // hot key 0 carries 200k of 299k left rows
    val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("lv"))
      .union(spark.range(0, 99000)
        .select((col("id") % 99 + 1).as("k"), col("id").as("lv")))
    val right = spark.range(0, 100).select(col("id").as("rk"), (col("id") * 2).as("rv"))
    val joined = left.join(right.hint("merge"), col("k") === col("rk"))
    joined.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected a runtime skew-split merge join:\n$plan")
    assert(plan.contains("AQEShuffleRead skewed"))
    // and the result is still correct
    assert(joined.count() === 200000L + 99000L)
  }
}
