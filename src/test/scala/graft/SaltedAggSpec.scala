package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SaltedAgg

/** SaltedAgg (round-17): the two-level aggregate + join-back must
  * attach exactly the values the r16 window form attached — on a
  * HOT-KEY fixture (one key owning most of the corpus, the exact
  * shape WindowExec cannot split) — and its plan must carry the
  * skew-safe structure: a partial (map-side) HashAggregate below the
  * aggregate exchange, and NO WindowExec anywhere.
  */
class SaltedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10_000 rows of the hot key (a corpus-wide boilerplate stand-in)
  // plus a long tail of singletons; ids interleave so partial aggs
  // see mixed groups.
  private def fixture = {
    val hot = (0L until 10000L).map(i => (i, "HOT"))
    val tail = (0L until 500L).map(i => (100000L + i, s"t$i"))
    (hot ++ tail).toDF("id", "k")
  }

  test("count attach equals the window form on a hot-key fixture") {
    val df = fixture
    val win = df.withColumn("c",
        count(lit(1)).over(Window.partitionBy(col("k"))))
      .select(col("id"), col("k"), col("c"))
    val salted = SaltedAgg.attach(df, "k", Seq(count(lit(1)).as("c")))
      .select(col("id"), col("k"), col("c"))
    assert(salted.except(win).isEmpty && win.except(salted).isEmpty)
    assert(salted.count() === df.count()) // attach keeps every row
  }

  test("min/max attach equals the window form") {
    val df = fixture
    val win = df
      .withColumn("mn", min(col("id")).over(Window.partitionBy(col("k"))))
      .withColumn("mx", max(col("id")).over(Window.partitionBy(col("k"))))
      .select(col("id"), col("k"), col("mn"), col("mx"))
    val salted = SaltedAgg.attach(df, "k",
        Seq(min(col("id")).as("mn"), max(col("id")).as("mx")))
      .select(col("id"), col("k"), col("mn"), col("mx"))
    assert(salted.except(win).isEmpty && win.except(salted).isEmpty)
  }

  test("plan: two-level aggregate (map-side partial), no WindowExec") {
    val out = SaltedAgg.attach(fixture, "k", Seq(count(lit(1)).as("c")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"map-side partial aggregate expected below the exchange:\n$plan")
    assert(!plan.contains("Window"), s"no WindowExec may remain:\n$plan")
  }
}
