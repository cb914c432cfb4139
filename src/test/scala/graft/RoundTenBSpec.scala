package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Bloom, Hll, Text}

/** Round-10 second wave: the sketch/membership operators behind
  * x76–x79 — properties the DuckDB oracle can't state (no false
  * negatives ever, mergeability, error bounds), proven at sf0.001.
  */
class RoundTenBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def grams(n: Int) = Tables(spark, dir, "documents")
    .withColumn("tk", Text.tokens(col("text")))
    .filter(size(col("tk")) >= n)
    .select(col("doc_id"), explode(Text.wordShingles(col("tk"), n)).as("gram"))

  test("Bloom: zero false negatives, bounded filter, plausible FP rate") {
    val g = grams(5)
    val ref = g.filter(col("doc_id") % 10 === 0).select("gram").distinct()
    val bits = Bloom.build(ref, col("gram"), j = 4).cache()
    val nBits = bits.count()
    assert(nBits <= 65536, "filter must stay within the 2^16 slot table")

    // no false negatives: every reference gram must test positive
    val refVerdicts = Bloom.test(ref, col("gram"), bits, j = 4)
    assert(refVerdicts.filter(!col("bloom_hit")).count() === 0)

    // false positives exist in principle but must stay near the
    // theoretical (1 - e^(-jn/m))^j; allow 5x headroom for variance
    val nonRef = g.join(ref, Seq("gram"), "left_anti")
      .select("gram").distinct()
    val fp = Bloom.test(nonRef, col("gram"), bits, j = 4)
      .filter(col("bloom_hit")).count()
    val nNonRef = nonRef.count()
    val p = math.pow(1.0 - math.exp(-4.0 * ref.count() / 65536.0), 4)
    assert(fp <= math.max(5, 5 * p * nNonRef),
      s"fp=$fp of $nNonRef vs theoretical p=$p")
    bits.unpersist()
  }

  test("Hll: registers merge (sketch of union == max of sketches)") {
    val g = grams(3).withColumn("h", Hll.h32(col("gram")))
      .select(Hll.regIndex(col("h")).as("idx"), Hll.rho(col("h")).as("rho"),
        col("doc_id"))
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("idx").agg(max("rho").as("m_rho"))
        .as[(Long, Int)].collect().toMap
    val whole = regsOf(g)
    val a = regsOf(g.filter(col("doc_id") % 2 === 0))
    val b = regsOf(g.filter(col("doc_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(i =>
      i -> math.max(a.getOrElse(i, 0), b.getOrElse(i, 0))).toMap
    assert(merged === whole,
      "register-wise max of shard sketches must equal the union sketch")
  }

  test("Hll: estimate lands within sketch error of the exact count") {
    val rows = ExtQueriesAccess.run(spark, dir, "x77_hll_distinct")
      .select(col("exact_distinct"), col("hll_estimate"))
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est) =>
      // sigma = 1.04/sqrt(64) = 13%; assert within 3.5 sigma
      assert(math.abs(est - exact) <= math.max(8.0, 0.455 * exact),
        s"estimate $est too far from exact $exact")
    }
  }

  test("x78: every collocation survived the min-count prune") {
    val out = ExtQueriesAccess.run(spark, dir, "x78_pmi_collocations")
    assert(out.filter(col("c_ab") < 5).count() === 0)
    assert(out.count() <= 20)
  }

  test("x80: only masked nodes, bounded votes, consistent correctness flag") {
    val out = ExtQueriesAccess.run(spark, dir, "x80_label_propagation")
    assert(out.count() > 0)
    assert(out.filter(col("src_id") % 5 =!= 0).count() === 0)
    assert(out.filter(col("n_votes") < 1 || col("n_votes") > 5).count() === 0)
    assert(out.filter(
      col("correct") =!= (col("predicted_label") === col("true_label")))
      .count() === 0)
  }

  test("x81: engine sample equals an exact driver-side A-ES replay") {
    val got = ExtQueriesAccess.run(spark, dir, "x81_weighted_sample")
      .select("source", "rnk", "doc_id").as[(String, Long, Long)].collect()
      .toSeq.sorted
    val docs = Tables(spark, dir, "documents")
      .filter(col("n_chars") > 0)
      .select("doc_id", "source", "n_chars")
      .as[(Long, String, Long)].collect()
    def key12(docId: Long, w: Long): BigDecimal = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
      val lnu8 = BigDecimal(math.log(u))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      BigDecimal(lnu8.toDouble / w.toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map(r => (key12(r._1, r._3), r._1))
        .sortBy { case (k, id) => (-k, id) }
        .take(10).zipWithIndex
        .map { case ((_, id), i) => (src, (i + 1).toLong, id) }
    }.sorted
    assert(got === expected)
  }

  test("x82/PowerIter: unit direction, Rayleigh quotient non-decreasing") {
    import graft.ext.{PowerIter, Similarity}
    val base = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))
    def rayleigh(v: Seq[Double]): Double = {
      val vl = typedlit(v)
      base.select(Similarity.dot(col("v"), vl).as("t"))
        .agg(sum(col("t") * col("t"))).head().getDouble(0)
    }
    val v1 = PowerIter.fit(base, "v", dims = 64, iters = 1)
    val v2 = PowerIter.fit(base, "v", dims = 64, iters = 2)
    assert(math.abs(v1.map(x => x * x).sum - 1.0) < 1e-12)
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-12)
    // power iteration never decreases the quadratic form (up to the
    // 2^-24 quantization jitter)
    assert(rayleigh(v2) >= rayleigh(v1) * (1 - 1e-6),
      s"Rayleigh fell: ${rayleigh(v1)} -> ${rayleigh(v2)}")

    val out = ExtQueriesAccess.run(spark, dir, "x82_power_iteration")
    assert(out.count() === 20)
    // Cauchy-Schwarz: residual energy ||x||^2 - (x.v)^2 >= 0 for a
    // unit v (tolerance for the 6-decimal projection rounding)
    assert(out.filter(col("resid6") < -1e-5).count() === 0)
  }

  test("x83: stages partition the corpus; dups are the id-shifted copies; packing is gapless") {
    val out = ExtQueriesAccess.run(spark, dir, "x83_pipeline_gate").cache()
    val n = Tables(spark, dir, "documents").count()
    assert(out.count() === 2 * n, "one disposition row per corpus doc")
    assert(out.select("stage").distinct().as[String].collect().toSet
      .subsetOf(Set("quality", "dup", "contam", "sample", "kept")))
    // a copy (id >= 10000) that passes quality can only fall at dedup:
    // its original shares the text and always holds the lower id
    assert(out.filter(col("doc_id") >= 10000 && col("stage") =!= "quality"
      && col("stage") =!= "dup").count() === 0)
    // packing: per (source, lang), kept offsets are gapless cumulative
    val kept = out.filter(col("stage") === "kept")
      .join(Tables(spark, dir, "documents").select("doc_id", "source", "lang"),
        "doc_id")
      .select("source", "lang", "doc_id", "tok_offset", "n_tokens")
      .as[(String, String, Long, Long, Long)].collect()
    assert(kept.nonEmpty)
    kept.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._4 === 0L, "first doc in a shard starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._5,
          s"offset gap between ${a._3} and ${b._3}")
        case _ =>
      }
    }
    out.unpersist()
  }

  test("x84: every quote finds its source at containment 1.0; Jaccard would miss them") {
    import graft.ext.Text
    val out = ExtQueriesAccess.run(spark, dir, "x84_containment_join").cache()
    val quotes = Tables(spark, dir, "documents")
      .withColumn("tk", Text.tokens(col("text")))
      .filter(col("doc_id") % 2 === 0 && size(col("tk")) >= 30)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(quotes.nonEmpty)
    // the planted truth: quote q (id+20000) ⊂ source q, containment exactly 1
    val selfPairs = out
      .filter(col("doc_id") === col("quote_id") - 20000)
      .select("quote_id", "containment").as[(Long, Double)].collect()
    assert(selfPairs.map(_._1 - 20000).toSet === quotes,
      "every planted quote must find its own source")
    assert(selfPairs.forall(_._2 === 1.0))
    // asymmetry: for most self pairs the source has far more trigrams
    // than the quote, so RESEMBLANCE (Jaccard = n_common / union) sits
    // below the 0.9 threshold that containment clears — the reason
    // this operator exists next to x12
    val jacBelow = out
      .filter(col("doc_id") === col("quote_id") - 20000)
      .join(Tables(spark, dir, "documents")
        .withColumn("tk", Text.tokens(col("text")))
        .select(col("doc_id"),
          size(Text.wordShingles(col("tk"))).cast("long").as("n_d")),
        "doc_id")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_q") + col("n_d") - col("n_common")).cast("double"))
      .filter(col("jaccard") < 0.9).count()
    assert(jacBelow > selfPairs.length / 2,
      "most planted pairs must be invisible to a 0.9 resemblance threshold")
    out.unpersist()
  }

  test("x79: retrieved documents really contain all three query terms") {
    val out = ExtQueriesAccess.run(spark, dir, "x79_boolean_retrieval")
      .select("doc_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    // recompute the top-3 df terms independently
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .distinct()
    val top3 = toks.groupBy("w").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(3)
      .select("w").as[String].collect().toSet
    val docsWithAll = toks.filter(col("w").isin(top3.toSeq: _*))
      .groupBy("doc_id").agg(countDistinct("w").as("n"))
      .filter(col("n") === 3).select("doc_id").as[Long].collect().toSet
    assert(out.subsetOf(docsWithAll))
  }
}

/** Test-side accessor for registered queries (the registry values are
  * what the driver runs; specs reuse them instead of re-pasting).
  */
object ExtQueriesAccess {
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): org.apache.spark.sql.DataFrame =
    SparkEntry.queries(name)(spark, dir)
}
