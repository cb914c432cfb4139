package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Secrets

/** Scale-technique demos that can't be oracle queries (they write
  * tables): bucketed co-located joins — the "pre-shuffle once, join
  * shuffle-free forever" layout for repeated fact-fact joins at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")

    val joined = spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"))

    // Both sides are bucketed on the join key with matching bucket
    // counts, so the join itself needs NO exchange: the only shuffle in
    // the whole plan would be for the aggregate — and it reuses the
    // bucketing too (o_orderkey is the bucket key), so there are none.
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected a fully co-located plan, found ${shuffles.size} shuffles")
    assert(joined.count() > 0)
  }

  test("secret source reads from injected environment only") {
    assert(Secrets.apiKey(Map.empty).isEmpty)
    assert(Secrets.apiKey(Map(Secrets.ApiKeyVar -> "k")) == Some("k"))
    assert(Secrets.apiKey(Map(Secrets.ApiKeyVar -> "")).isEmpty)
  }
}
