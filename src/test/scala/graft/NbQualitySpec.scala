package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Auc, NaiveBayes, Text}
import graft.queries.ExtQueries

/** x101 Naive Bayes quality classifier and x102 Pareto-gated
  * acceptance:
  *  - hand-computed model law: llr/prior/unseen weights and holdout
  *    scores on a fixture small enough to derive on paper;
  *  - the classifier LEARNS the planted signal from counts: on the
  *    x101 corpus construction the trained model assigns positive
  *    llr to the swapped-in variants and negative llr to their
  *    originals (aggregate counts — no per-doc noise in the claim);
  *  - ranking power: AUC of the holdout scores against the planted
  *    class is high (rank statistic, robust to individual outliers);
  *  - x102 acceptance math: Pareto boundary cases (u=0 rejects even
  *    the top rank; large u accepts low ranks), kept fraction near
  *    the analytic (1 − 2⁻⁸)/8 ≈ 12.4%, and the gate's monotonicity
  *    (a kept doc's quality rank exceeds a rejected doc's at equal
  *    draw — checked via mean ranks).
  */
class NbQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("model law: hand-computed llr, prior, unseen, and scores") {
    // train: pos = {good good fine}, neg = {bad bad awful}
    // N_pos = N_neg = 3, V = 4, priors 1:1
    val train = Seq((1L, "good good fine", 1L), (2L, "bad bad awful", 0L))
      .toDF("doc_id", "text", "label")
      .withColumn("t", Text.tokens(col("text")))
    val (model, consts) = NaiveBayes.train(train, "t", "label")
    val m = model.as[(String, Long)].collect().toMap
    // llr(good) = ln((2+1)(3+4) / ((0+1)(3+4))) = ln 3
    assert(m("good") === 1098612L)
    // llr(fine) = ln 2; llr(bad) = -ln 3; llr(awful) = -ln 2
    assert(m("fine") === 693147L)
    assert(m("bad") === -1098612L)
    assert(m("awful") === -693147L)
    val (prior, unseen) = consts.as[(Long, Long)].head()
    assert(prior === 0L)  // ln((1+1)/(1+1))
    assert(unseen === 0L) // ln((3+4)/(3+4))
    val holdout = Seq((10L, "good fine zzz"), (11L, "bad awful"))
      .toDF("doc_id", "text")
      .withColumn("t", Text.tokens(col("text")))
    val sc = NaiveBayes.score(holdout, Seq("doc_id"), "t", model, consts)
      .select(col("doc_id"), col("n_toks"), col("score_e6"), col("pred"))
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // zzz is unseen → contributes exactly unseen_e6 = 0
    assert(sc(10L) === ((10L, 3L, 1098612L + 693147L, true)))
    assert(sc(11L) === ((11L, 2L, -1098612L - 693147L, false)))
  }

  /** The x101 corpus construction (planted class-conditional swap). */
  private def plantedDocs = {
    Tables(spark, dir, "documents")
      .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
      .withColumn("t0", Text.tokens(col("text")))
      .withColumn("t",
        when((col("label") === 1L) && (col("doc_id") % 2 === 0),
          expr("transform(t0, x -> CASE WHEN x = 'data' THEN 'datum' " +
            "WHEN x = 'table' THEN 'tbl' ELSE x END)"))
          .otherwise(col("t0")))
      .select(col("doc_id"), col("label"), col("t"))
  }

  test("the model discovers the planted signal from counts alone") {
    val (model, _) =
      NaiveBayes.train(plantedDocs.filter(col("doc_id") % 3 === 0),
        "t", "label")
    val m = model.filter(col("token").isin("datum", "tbl", "data", "table"))
      .as[(String, Long)].collect().toMap
    // swapped-in variants exist only in (even, en) docs → strongly
    // positive; their originals are now relatively non-en → negative
    assert(m("datum") > 0L, s"llr(datum)=${m.get("datum")}")
    assert(m("tbl") > 0L, s"llr(tbl)=${m.get("tbl")}")
    assert(m("data") < 0L, s"llr(data)=${m.get("data")}")
    assert(m("table") < 0L, s"llr(table)=${m.get("table")}")
  }

  test("holdout scores rank the planted class highly (AUC)") {
    val out = ExtQueries.queries("x101_nb_quality")(spark, dir)
    val scored = out.withColumn("planted",
      (col("label") === 1L) && (col("doc_id") % 2 === 0))
    val auc6 = Auc.auc(scored, col("score_e6"), col("planted"))
      .select(col("auc6")).as[Double].head()
    assert(auc6 >= 0.85, s"auc6=$auc6")
  }

  test("x102 acceptance: boundary math, keep rate, rank monotonicity") {
    val out = ExtQueries.queries("x102_quality_accept")(spark, dir)
      .localCheckpoint()
    val rows = out.select(col("rank_ppm"), col("u_ppm"),
      col("pareto_e6"), col("keep")).as[(Long, Long, Long, Boolean)]
      .collect()
    // the continuous rule: keep ⇔ rank_ppm + pareto_e6 > 1e6; a zero
    // draw (u=0 → pareto=0) rejects even the top rank (rank_ppm=1e6)
    rows.foreach { case (r, _, p, k) =>
      assert(k === (r + p > 1000000L))
      assert(p >= 0L)
    }
    // closed form through the query's own expression shape: u = 0.5 →
    // (0.5)^(-1/9) − 1 = 0.0800597… → 80060 micro-units (the exponent
    // is a SCALA double — the SQL-text literal would be decimal math)
    val half = spark.range(1).select(
      round(round(pow(lit(1.0) - lit(500000.0) / 1000000.0, -1.0 / 9.0)
        - lit(1.0), 6) * 1e6).cast("long").as("p")).as[Long].head()
    assert(half === 80060L)
    val kept = rows.count(_._4).toDouble / rows.length
    assert(kept > 0.04 && kept < 0.25, s"kept fraction $kept")
    val meanKept = rows.filter(_._4).map(_._1).sum.toDouble /
      math.max(rows.count(_._4), 1)
    val meanRej = rows.filterNot(_._4).map(_._1).sum.toDouble /
      math.max(rows.count(!_._4), 1)
    assert(meanKept > meanRej,
      s"kept mean rank $meanKept vs rejected $meanRej")
  }
}
