package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtQueries

/** Round-7 operators: repeated-span detection (x55), DSIR importance
  * weights (x56), the per-source quality gate (x57), SemDeDup (x58)
  * and PQ-ADC search (x59). The DuckDB oracle already pins exact
  * values at sf0.01; these tests pin the SEMANTIC invariants each
  * operator exists for — the properties a refactor must not lose —
  * on sf0.001 where a full run is cheap.
  */
class RoundSevenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = ExtQueries.queries(name)(spark, dir)

  test("x55: every doc appears once; planted trims produce dup spans") {
    val rows = run("x55_repeated_spans")
      .select($"doc_id", $"n_dup_windows", $"max_span_tokens")
      .as[(Long, Long, Long)].collect()
    // corpus = docs ∪ trimmed twins → one output row per corpus doc
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.length == 2 * docs)
    assert(rows.map(_._1).distinct.length == rows.length)
    // a trimmed twin shares its whole (len−3)-token prefix with the
    // original: any original with ≥ w+3 = 13 tokens must show a dup
    // span of at least its twin's length, and vice versa
    val dup = rows.filter(_._2 > 0)
    assert(dup.nonEmpty, "planted prefix twins must surface as dup spans")
    // span length can never exceed the window count implies
    // max_span_tokens = run + w - 1 ≥ w whenever any dup window exists
    dup.foreach { case (id, _, span) =>
      assert(span >= 10, s"doc $id has dup windows but span $span < w")
    }
    // and docs with zero dup windows must report zero span
    rows.filter(_._2 == 0).foreach { case (id, _, span) =>
      assert(span == 0, s"doc $id has no dup windows but span $span")
    }
  }

  test("x56: target-domain docs score higher than off-domain docs") {
    val w = run("x56_dsir_weights")
      .join(Tables(spark, dir, "documents").select($"doc_id", $"lang"),
        "doc_id")
      // per-token weight, so length differences don't drive the check
      .select($"lang" === "en", $"dsir_micro".cast("double") / $"n_tokens")
      .as[(Boolean, Double)].collect()
    val en = w.filter(_._1).map(_._2)
    val rest = w.filterNot(_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    // the entire point of importance weighting: the target slice's
    // mean log-ratio must exceed the off-target slice's
    assert(en.sum / en.length > rest.sum / rest.length,
      "English (target) docs must out-score non-English docs")
  }

  test("x57: each source keeps exactly its top 3 quartiles") {
    val rows = run("x57_source_quality_gate")
      .select($"source", $"keep").as[(String, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val n = rs.length
      val kept = rs.count(_._2)
      // keep ⟺ rnk·4 > n — exactly n − ⌊n/4⌋ rows pass
      assert(kept == n - n / 4, s"source $src: kept $kept of $n")
    }
  }

  test("x58: clusters are exactly the planted (i, i+100000) pairs or singletons") {
    val rows = run("x58_semdedup")
      .select($"vec_id", $"cluster_id", $"cluster_size", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val base = Tables(spark, dir, "embeddings").count()
    assert(rows.length == 2 * base)
    // random 64-dim vectors never reach cosine 0.99 with each other —
    // only a vector and its quantized twin can pair
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.length <= 2, s"cluster $cid has ${members.length} members")
      if (members.length == 2) {
        val ids = members.map(_._1).sorted
        assert(ids(1) == ids(0) + 100000L,
          s"cluster $cid pairs unrelated vectors ${ids.mkString(",")}")
      }
    }
    // the representative is the min id, and only representatives keep
    rows.foreach { case (id, cid, _, keep) =>
      assert(keep == (id == cid))
    }
    // quantized twins are near-identical: the overwhelming majority
    // must pair up (a twin can only escape via a cell-boundary split)
    val paired = rows.count(_._3 == 2)
    assert(paired >= (2 * base * 8) / 10,
      s"only $paired of ${2 * base} vectors paired with their twin")
  }

  test("x59: PQ-ADC returns a full, deterministic, self-free top-k") {
    val out = run("x59_pq_adc")
      .select($"query_id", $"rnk", $"neighbor_id", $"adc_d2")
      .as[(Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 20)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L), s"query $q ranks")
      assert(rows.forall(_._3 != q), s"query $q returned itself")
      assert(rows.forall(_._4 >= 0.0), s"query $q negative ADC distance")
      // ranks must follow the (distance, id) order they claim
      val sorted = rows.sortBy(_._2).map(r => (r._4, r._3))
      assert(sorted.toSeq == sorted.sortBy(identity).toSeq,
        s"query $q rank order disagrees with (adc_d2, neighbor_id)")
    }
    // deterministic end to end: a second run is bit-identical
    val again = run("x59_pq_adc")
      .select($"query_id", $"rnk", $"neighbor_id", $"adc_d2")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
