package graft

import java.sql.Date

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc

/** Round-6 operators: CDC apply, the bucketed-join query, and the
  * derived-data audits (snapshot diff, DQ expectations, outlier
  * fences). Semantics on hand-built frames; plan shape where the scale
  * argument lives in the plan.
  */
class RoundSixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("Cdc.applyLatest keeps the latest change and drops deleted keys") {
    val log = Seq(
      // key 1: I then U — survives with the U payload
      (1L, 1L, "I", 10.0), (1L, 2L, "U", 11.0),
      // key 2: latest is D — dropped
      (2L, 1L, "I", 20.0), (2L, 2L, "D", 0.0),
      // key 3: deleted then re-inserted — survives (latest is I)
      (3L, 1L, "I", 30.0), (3L, 2L, "D", 0.0), (3L, 3L, "I", 31.0)
    ).toDF("k", "seq", "op", "price")
    val out = Cdc.applyLatest(log, "k", Seq(col("seq")), "op")
      .select($"k", $"op", $"price", $"n_changes")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "U", 11.0, 2L), (3L, "I", 31.0, 3L)))
  }

  test("Cdc.applyLatest is insensitive to log row order") {
    val rows = Seq(
      (1L, 1L, "I", 10.0), (1L, 3L, "U", 12.0), (1L, 2L, "U", 11.0))
    val a = Cdc.applyLatest(rows.toDF("k", "seq", "op", "p"),
      "k", Seq(col("seq")), "op").select($"p").as[Double].collect()
    val b = Cdc.applyLatest(rows.reverse.toDF("k", "seq", "op", "p"),
      "k", Seq(col("seq")), "op").select($"p").as[Double].collect()
    assert(a.toSeq == Seq(12.0) && b.toSeq == Seq(12.0))
  }

  test("q28: bucketed layout leaves only the post-join aggregate shuffle") {
    val df = SparkEntry.queries("q28_bucketed_join")(spark, dir)
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    // join inputs are co-located (bucketBy 8 on the key, sortBy for the
    // merge); the one legitimate exchange is groupBy(o_orderpriority),
    // whose key differs from the bucket key
    assert(shuffles.size <= 1,
      s"expected at most the aggregate exchange, found ${shuffles.size}")
    assert(df.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }

  test("x45: diff statuses match the v2 derivation") {
    val byStatus = SparkEntry.queries("x45_snapshot_diff")(spark, dir)
      .groupBy($"status").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val docs = Tables(spark, dir, "documents")
    val n = docs.count()
    def cnt(m: Int) = docs.filter(pmod($"doc_id", lit(10)) === m).count()
    assert(byStatus.getOrElse("removed", 0L) == cnt(0))
    assert(byStatus.getOrElse("changed", 0L) == cnt(1))
    assert(byStatus.getOrElse("added", 0L) == cnt(2))
    assert(byStatus.getOrElse("unchanged", 0L) == n - cnt(0) - cnt(1))
  }

  test("x46: the DQ audit reports one row per check over the full table") {
    val rows = SparkEntry.queries("x46_dq_expectations")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 7)
    assert(rows.map(_._1).toSet == Set(
      "duplicate_event_id", "malformed_props", "negative_value", "null_ts",
      "null_value", "ts_out_of_range", "unknown_event_type"))
    val nRows = Tables(spark, dir, "events").count()
    assert(rows.forall(_._2 == nRows))
    // clean synthetic data: every check passes
    assert(rows.forall(_._3 == 0L), s"unexpected violations: ${rows.toSeq}")
  }

  test("x48: planted anomalies land outside the Tukey fences") {
    val out = SparkEntry.queries("x48_outlier_fences")(spark, dir)
      .select($"event_type", $"n_events", $"n_above")
      .as[(String, Long, Long)].collect()
    assert(out.map(_._2).sum == Tables(spark, dir, "events").count())
    // every 199th event is amplified x25 — far beyond p75 + 1.5 IQR of
    // a bounded uniform distribution, so some must be flagged
    assert(out.map(_._3).sum > 0, s"no anomalies flagged: ${out.toSeq}")
  }

  test("CDC latest state agrees with the SCD2 current version") {
    // two views of the same change log (events keyed by user): q26's
    // is_current row and Cdc's survivor must name the same last change
    val scd2 = SparkEntry.queries("q26_scd2_versions")(spark, dir)
      .filter($"is_current")
      .select($"user_id", $"event_type".as("scd_type"))
    val ev = Tables(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type", lit("U").as("op"))
    val cdc = Cdc.applyLatest(ev, "user_id", Seq(col("ts"), col("event_id")), "op")
      .select($"user_id", $"event_type".as("cdc_type"))
    val disagree = scd2.join(cdc, "user_id")
      .filter($"scd_type" =!= $"cdc_type").count()
    assert(disagree == 0L)
    assert(scd2.count() == cdc.count())
  }

  test("x50: the binned quantile brackets the exact rank percentile") {
    // same rank definition (ceil(n*p) == floor((n-1)*p)+1 for p=0.5),
    // so the exact p50 must fall inside the sketch's reported bin
    val sketch = SparkEntry.queries("x50_binned_quantiles")(spark, dir)
      .select($"event_type", $"p50_ub").as[(String, Double)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value", $"event_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    val exact = Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wc))
      .filter($"rn" === floor(($"n" - 1) * 0.5) + 1)
      .select($"event_type", $"value").as[(String, Double)].collect().toMap
    exact.foreach { case (typ, v) =>
      val ub = sketch(typ)
      assert(v < ub && v >= ub - 0.5,
        s"$typ: exact p50 $v outside sketch bin ($ub - 0.5, $ub]")
    }
  }

  test("x43: per-language selections are min(quota, available)") {
    val out = SparkEntry.queries("x43_mixture_sample")(spark, dir)
    val got = out.filter($"selected").groupBy($"lang")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val avail = out.groupBy($"lang").agg(count(lit(1)).as("n"), max($"quota"))
      .as[(String, Long, Long)].collect()
    avail.foreach { case (lang, n, quota) =>
      assert(got.getOrElse(lang, 0L) == math.min(n, quota),
        s"$lang: selected ${got.get(lang)} != min($n, $quota)")
    }
  }

  test("q30: streak arithmetic on a known activity pattern") {
    val ev = Seq(
      (7L, Date.valueOf("2024-01-01")), (7L, Date.valueOf("2024-01-02")),
      (7L, Date.valueOf("2024-01-02")), // same-day duplicate collapses
      (7L, Date.valueOf("2024-01-05")),
      (8L, Date.valueOf("2024-01-03"))
    ).toDF("user_id", "d")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"d")
    val out = ev.distinct()
      .withColumn("anchor", date_sub($"d", row_number().over(w)))
      .groupBy($"user_id", $"anchor").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").as("active"), count(lit(1)).as("streaks"),
        max($"len").as("longest"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((7L, 3L, 2L, 2L), (8L, 1L, 1L, 1L)))
  }
}
