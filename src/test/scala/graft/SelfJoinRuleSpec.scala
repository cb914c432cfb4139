package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Text}

/** PreferMergeForSelfJoins (injected by GraftExtensions into the shared
  * test session): an UN-hinted expensive self-join must plan as a
  * merge join with one reused exchange; a cheap self-join must stay on
  * the default (broadcast) path.
  */
class SelfJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    df.queryExecution.executedPlan.toString
  }

  test("expensive self-join: rule forces merge + exchange reuse without a hint") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Text.wordShingles(Text.tokens(col("text"))).as("s"))
    // the x02 shape WITHOUT the manual hint("merge")
    val keyed = docs
      .withColumn("sig", Dedup.minhashSignature(col("s"), 12))
      .select(col("doc_id").as("id"),
        posexplode(Dedup.bandHashes(col("sig"), 4, 3)).as(Seq("b", "h")))
    val pairs = keyed.as("a").join(keyed.as("b"),
      col("a.b") === col("b.b") && col("a.h") === col("b.h") &&
        col("a.id") < col("b.id"))
    val plan = executedPlan(pairs)
    assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
    assert(plan.contains("ReusedExchange"),
      "the shared signature pipeline must be computed once")
    assert(!plan.contains("BroadcastHashJoin"))
  }

  test("cheap self-join: rule does not fire, broadcast remains") {
    val small = Seq((1L, "x"), (2L, "y"), (3L, "x")).toDF("id", "k")
    val joined = small.as("a").join(small.as("b"),
      col("a.k") === col("b.k") && col("a.id") < col("b.id"))
    val plan = executedPlan(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"plain small self-scan should still broadcast:\n$plan")
  }
}
