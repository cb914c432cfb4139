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
    val salted = SaltedAgg.attach(df, "k", Seq(col("id")),
        Seq(count(lit(1)).as("p_c")), Seq(sum(col("p_c")) -> "c"))
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
    val salted = SaltedAgg.attach(df, "k", Seq(col("id")),
        Seq(min(col("id")).as("p_mn"), max(col("id")).as("p_mx")),
        Seq(min(col("p_mn")) -> "mn", max(col("p_mx")) -> "mx"))
      .select(col("id"), col("k"), col("mn"), col("mx"))
    assert(salted.except(win).isEmpty && win.except(salted).isEmpty)
  }

  test("plan: salted two-level aggregate, shuffled-hash attach") {
    val out = SaltedAgg.attach(fixture, "k", Seq(col("id")),
      Seq(count(lit(1)).as("p_c")), Seq(sum(col("p_c")) -> "c"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"attach join must be shuffled-hash on (key, salt):\n$plan")
    // the only window left is the level-2 merge over the PARTIALS
    // (groups <= Buckets by construction), never over the raw stream
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("Window", winIdx + 1) < 0,
      s"exactly one bounded partial-side window expected:\n$plan")
    // the hot key's rows really spread across salt buckets
    val groups = fixture.withColumn("s", SaltedAgg.salt(col("id")))
      .filter(col("k") === "HOT").select(col("s")).distinct().count()
    assert(groups > 1, s"salt must split the hot key, got $groups group")
  }

  test("filterKeys equals filter-on-window-aggregate") {
    val df = fixture
    val win = df
      .withColumn("mn", min(col("id")).over(Window.partitionBy(col("k"))))
      .withColumn("mx", max(col("id")).over(Window.partitionBy(col("k"))))
      .filter(col("mn") =!= col("mx"))
      .select(col("id"), col("k"))
    val salted = SaltedAgg.filterKeys(df, "k", Seq(col("id")),
        Seq(min(col("id")).as("p_mn"), max(col("id")).as("p_mx")),
        Seq(min(col("p_mn")) -> "mn", max(col("p_mx")) -> "mx"),
        col("mn") =!= col("mx"))
      .select(col("id"), col("k"))
    assert(salted.except(win).isEmpty && win.except(salted).isEmpty)
    assert(salted.count() === win.count())
  }
}
