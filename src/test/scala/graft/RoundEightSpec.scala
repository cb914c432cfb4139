package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{KMeansLite, Similarity}
import graft.queries.ExtQueries

/** Round-8: the composed IVF+PQ ANN index (x72) — coarse shortlist ×
  * product-quantized ADC scan × exact-recall audit. The DuckDB oracle
  * pins exact values at sf0.01; these tests pin the semantic laws at
  * sf0.001: result shape, ADC rank ordering, and — the point of the
  * composition — that `exact_hit` is EXACTLY membership in the
  * brute-force squared-distance top-k (so recall@k read off the flags
  * is a true recall, not a self-graded one), with a floor that a
  * 2-of-8-cells shortlist must comfortably beat zero.
  */
class RoundEightSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x72: shape and per-query ADC rank ordering") {
    val rows = ExtQueries.queries("x72_ivfpq_ann")(spark, dir)
      .select($"query_id", $"rnk", $"neighbor_id", $"adc_d2", $"exact_hit")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.length == 100, "20 queries x top-5")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to 5L), s"query $q ranks")
      val byRank = rs.sortBy(_._2)
      assert(byRank.sliding(2).forall(p => p(0)._4 <= p(1)._4),
        s"query $q ADC distances must be non-decreasing in rank")
      assert(rs.forall(_._3 != q), s"query $q returned itself")
    }
  }

  test("x72: exact_hit equals brute-force top-5 membership; recall floor") {
    val rows = ExtQueries.queries("x72_ivfpq_ann")(spark, dir)
      .select($"query_id", $"neighbor_id", $"exact_hit")
      .as[(Long, Long, Boolean)].collect()
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))
      .as[(Long, Array[Double])].collect().toMap
    // same left-fold summation order as KMeansLite.dist2's aggregate
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def q6(v: Double): Double = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exactTop = rows.map(_._1).distinct.map { q =>
      val qv = vecs(q)
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (q6(d2(qv, v)), id) }
        .sortBy(identity).take(5).map(_._2).toSet
    }.toMap
    rows.foreach { case (q, n, hit) =>
      assert(hit == exactTop(q).contains(n),
        s"query $q neighbor $n: flag $hit disagrees with brute force")
    }
    val recall = rows.count(_._3).toDouble / rows.length
    assert(recall >= 0.1 && recall <= 1.0,
      s"recall@5 $recall outside the expected band for nProbe=2 of 8 cells")
  }

  test("x73: ranks well-formed, distances symmetric, no self edges") {
    val rows = ExtQueries.queries("x73_knn_graph")(spark, dir)
      .select($"src_id", $"rnk", $"neighbor_id", $"d2_e6")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1L to rs.length),
        s"src $src ranks must be 1..k with no gaps")
      assert(rs.length <= 5, s"src $src returned more than top-5")
      val byRank = rs.sortBy(_._2)
      assert(byRank.sliding(2).forall(p =>
        p.length < 2 || p(0)._4 <= p(1)._4),
        s"src $src distances must be non-decreasing in rank")
      assert(rs.forall(_._3 != src), s"src $src returned itself")
    }
    // (x-y)^2 == (y-x)^2 exactly in IEEE and the fold order is shared,
    // so whenever both directed edges survive their top-5 cuts the
    // micro-unit distances must agree bit-for-bit
    val d = rows.map(r => (r._1, r._3) -> r._4).toMap
    val sym = rows.flatMap(r => d.get((r._3, r._1)).map(b => (r._4, b)))
    assert(sym.nonEmpty, "expected at least one mutual neighbor pair")
    sym.foreach { case (ab, ba) =>
      assert(ab == ba, s"asymmetric distance: $ab vs $ba")
    }
  }

  test("x73: every edge stays inside the source's k-means cell") {
    val corpus = Tables(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))
    // the registry entry runs the k∝corpus discipline since round 11 —
    // re-derive cells at the same k or the comparison is meaningless
    val cents = KMeansLite.fitQuantized(corpus, "vec_id", "v",
      ExtQueries.corpusK(corpus.count()), iters = 1)
    val cellOf = corpus
      .select($"vec_id", KMeansLite.assign($"v", cents).as("cell"))
      .as[(Long, Int)].collect().toMap
    val rows = ExtQueries.queries("x73_knn_graph")(spark, dir)
      .select($"src_id", $"neighbor_id").as[(Long, Long)].collect()
    rows.foreach { case (s, n) =>
      assert(cellOf(s) == cellOf(n),
        s"edge $s->$n crosses cells ${cellOf(s)} vs ${cellOf(n)}")
    }
  }

  test("x74: hand-computed merge fixture (ties, chains, overlap rule)") {
    val tmp = java.nio.file.Files.createTempDirectory("bpe_fix").toString
    Seq(
      (1L, "a b a b c d", "en", "s1", 11L),
      (2L, "a b c c d", "en", "s1", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val out = ExtQueries.queries("x74_bpe_merges")(spark, tmp)
      .select($"doc_id", $"n_before", $"n_after", $"text_merged",
        $"merge_1", $"merge_2", $"merge_3")
      .as[(Long, Long, Long, String, String, String, String)]
      .collect().sortBy(_._1)
    // round 1: (a,b) wins with count 3; round 2: (a_b,c) ties (c,d)
    // at 2 and wins on pair order; round 3: four singletons tie and
    // (a_b, a_b_c) wins because U+0001 sorts below '_'
    assert(out(0) == ((1L, 6L, 2L, "a_b_a_b_c d",
      "a_b", "a_b_c", "a_b_a_b_c")), s"doc 1 got ${out(0)}")
    assert(out(1) == ((2L, 5L, 3L, "a_b_c c d",
      "a_b", "a_b_c", "a_b_a_b_c")), s"doc 2 got ${out(1)}")
  }

  test("x74: merges only shrink, pairs have distinct halves (sf0.001)") {
    val out = ExtQueries.queries("x74_bpe_merges")(spark, dir)
      .select($"n_before", $"n_after", $"merge_1", $"merge_2", $"merge_3")
      .as[(Long, Long, String, String, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (nb, na, m1, m2, m3) =>
      assert(na <= nb && na >= 1)
      assert(Seq(m1, m2, m3).forall(_.contains("_")))
    }
    // the three learned merges are corpus-level constants
    assert(out.map(r => (r._3, r._4, r._5)).distinct.length == 1)
  }
}
