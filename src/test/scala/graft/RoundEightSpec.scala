package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
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
}
