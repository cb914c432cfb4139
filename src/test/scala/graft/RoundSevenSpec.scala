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

  test("x65: repeated spans are cut, unique tails survive, rebuild is exact") {
    val rows = run("x65_span_removal")
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_md5")
      .as[(Long, Long, Long, String)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString
    var full = 0
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+")
      if (toks.length >= 13) {
        // the twin (id+10000) is the doc minus its last 3 tokens: its
        // WHOLE text repeats in the original, so every twin token is
        // covered and the twin rebuilds to the empty string
        val twin = byId(id + 10000L)
        assert(twin._3 == twin._2, s"twin of $id kept ${twin._2 - twin._3}")
        assert(twin._4 == emptyMd5)
        // the original loses at least that shared prefix but keeps a
        // tail iff its last 3 tokens end a unique run
        val orig = byId(id)
        assert(orig._3 >= toks.length - 3, s"doc $id removed only ${orig._3}")
        if (orig._3 == orig._2) full += 1
      }
    }
    // docs whose tail windows happen to repeat elsewhere may be fully
    // cut; most originals must keep something
    val originals = rows.filter(r => r._1 < 10000L && r._2 >= 13)
    assert(full < originals.length,
      "every original was fully cut — tails should survive")
    // no doc removes more than it has
    rows.foreach(r => assert(r._3 <= r._2))
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

  test("x60: planted full copies contribute zero novel n-grams") {
    val rows = run("x60_ngram_novelty")
      .select($"doc_id", $"n_distinct_ngrams", $"n_novel", $"novelty_ppm")
      .as[(Long, Long, Long, Long)].collect()
    val (planted, originals) = rows.partition(_._1 >= 10000L)
    assert(planted.nonEmpty && originals.nonEmpty)
    // every planted copy's windows were claimed by its lower-id
    // original — zero novelty is the defining invariant
    planted.foreach { case (id, _, novel, ppm) =>
      assert(novel == 0 && ppm == 0, s"copy $id claims $novel novel n-grams")
    }
    originals.foreach { case (id, dist, novel, _) =>
      assert(novel <= dist, s"doc $id: novel $novel > distinct $dist")
    }
    // corpus-wide: every distinct window is claimed exactly once —
    // compare against an independent distinct count (originals only;
    // full copies add no new windows)
    val claimed = rows.map(_._3).sum
    val distinctWindows = Tables(spark, dir, "documents")
      .withColumn("t", split($"text", "\\s+"))
      .filter(size($"t") >= 5)
      .select(explode(expr("transform(sequence(0, size(t) - 5)," +
        " i -> md5(array_join(slice(t, i + 1, 5), ' ')))")).as("h"))
      .agg(countDistinct($"h")).as[Long].head()
    assert(claimed == distinctWindows,
      s"claimed $claimed != distinct $distinctWindows")
  }

  test("x61: each cell flags exactly its top 5% as outliers") {
    val rows = run("x61_embed_outliers")
      .select($"cell", $"rnk", $"pop", $"outlier")
      .as[(Long, Long, Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (cell, members) =>
      val pop = members.head._3
      val flagged = members.count(_._4)
      assert(flagged == pop / 20, s"cell $cell flagged $flagged of $pop")
      // flagged rows are exactly the lowest ranks (farthest first)
      members.filter(_._4).foreach { case (_, rnk, _, _) =>
        assert(rnk * 20 <= pop)
      }
    }
  }

  test("x63: every stratum holds out exactly its ceil(5%) quota") {
    val rows = run("x63_stratified_eval")
      .select($"source", $"lang", $"pop", $"quota", $"split")
      .as[(String, String, Long, Long, String)].collect()
    rows.groupBy(r => (r._1, r._2)).foreach { case (stratum, members) =>
      val pop = members.head._3
      val quota = members.head._4
      assert(quota == (pop + 19) / 20, s"$stratum quota")
      assert(quota >= 1, s"$stratum starved") // ceil never hits zero
      val eval = members.count(_._5 == "eval")
      assert(eval == quota, s"$stratum held out $eval, quota $quota")
      assert(members.length == pop)
    }
  }

  test("x64: budget respected, selection is a score threshold + boundary") {
    val rows = run("x64_token_budget_select")
      .select($"doc_id", $"n_tokens", $"score", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val kept = rows.filter(_._4)
    val dropped = rows.filterNot(_._4)
    assert(kept.nonEmpty && dropped.nonEmpty)
    // hard budget: kept tokens never exceed it
    assert(kept.map(_._2).sum <= 10000L,
      s"kept ${kept.map(_._2).sum} tokens > budget")
    // threshold structure: everything strictly above the lowest kept
    // score is kept; everything dropped sits at or below it
    val sB = kept.map(_._3).min
    rows.filter(_._3 > sB).foreach { r =>
      assert(r._4, s"doc ${r._1} (score ${r._3} > $sB) was dropped")
    }
    dropped.foreach { r =>
      assert(r._3 <= sB, s"dropped doc ${r._1} outranks kept boundary")
    }
  }

  test("x62: over-represented clusters are cut, small ones kept whole") {
    val rows = run("x62_cluster_balance")
      .select($"cell", $"pop", $"cap256", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val total = rows.length
    val fair = total / 8
    rows.groupBy(_._1).foreach { case (cell, members) =>
      val pop = members.head._2
      val cap = members.head._3
      if (pop <= fair) {
        // under-represented: fair·256/pop ≥ 256 → everything kept
        assert(cap == 256L, s"cell $cell pop $pop cap $cap")
        assert(members.forall(_._4))
      } else {
        assert(cap < 256L, s"cell $cell pop $pop should be capped")
        // the deterministic sample hits close to its target rate; at
        // these populations the md5 buckets land within a loose band
        val kept = members.count(_._4)
        assert(kept < pop, s"cell $cell kept everything despite cap")
      }
    }
  }
}
