package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Text, Winnow}
import graft.queries.ExtQueries

/** Round-12 session-4 operators:
  *  - Winnow: the MOSS selection rule against an independent plain-
  *    Scala recompute (same md5 40-bit gram hashes, same rightmost-
  *    min-per-window law), the w+k−1 shared-substring guarantee on
  *    insertion-shifted copies, and the ~2/(w+1) density band;
  *  - x112 DSIR: the bucket log-ratio law (target-enriched buckets
  *    weigh positive), Gumbel determinism, and top-k ordering;
  *  - x113 capture–recapture: the Chapman identity over the output's
  *    own columns and equal-catchability by construction;
  *  - x114 temperature mixing: w ∝ √p renormalization identities and
  *    the head-demotes/tail-promotes direction.
  */
class RoundTwelveCSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala mirror of Winnow.fingerprints: 40-bit md5 gram hash,
    * encoded rightmost-min selection, full windows only.
    */
  private def winnowScala(toks: Seq[String], k: Int, w: Int)
      : Set[(Long, Long)] = {
    def h40(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    if (toks.length < k + w - 1) return Set.empty
    val grams = (0 to toks.length - k)
      .map(i => h40(toks.slice(i, i + k).mkString(" ")))
    val keys = grams.zipWithIndex
      .map { case (h, i) => h * Winnow.PosSpan + (Winnow.PosSpan - 1 - i) }
    (0 to grams.length - w).map { i =>
      val sel = keys.slice(i, i + w).min
      (sel / Winnow.PosSpan, Winnow.PosSpan - 1 - sel % Winnow.PosSpan)
    }.toSet
  }

  test("Winnow matches the plain-Scala recompute on a fixture") {
    val toks = ("the quick brown fox jumps over the lazy dog while the " +
      "quick brown fox naps").split(" ").toSeq
    val df = Seq((1L, toks)).toDF("doc_id", "t")
    val got = Winnow.fingerprints(df, "t", 4, 5)
      .select("fp_h", "fp_pos").as[(Long, Long)].collect().toSet
    assert(got === winnowScala(toks, 4, 5))
    assert(got.nonEmpty)
  }

  test("Winnow: insertion-shifted copy shares every interior hash") {
    val base = (1 to 30).map(i => s"tok$i")
    val shifted = Seq("x", "y", "z") ++ base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "t")
    val fps = Winnow.fingerprints(df, "t", 4, 5)
      .as[(Long, Long, Long)].collect()
    val h1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._2).toSet
    // the SIGMOD guarantee: the 30-token shared substring (≥ w+k−1=8)
    // must yield at least one shared fingerprint hash; in practice
    // every hash of doc 1 must re-select in doc 2 except possibly
    // those whose selecting windows straddle the new prefix
    assert((h1 intersect h2).nonEmpty)
    assert((h1 -- h2).size <= 2)
    // density: selected windows per doc ≈ 2/(w+1) of grams, loose band
    val nGrams = base.length - 4 + 1
    assert(h1.size >= nGrams / 5 && h1.size <= nGrams)
  }

  test("x111 registry: copies near-dup, majority share, oracle shape") {
    val out = ExtQueries.queries("x111_winnowing")(spark, dir)
    val rows = out.select("doc_id", "n_fp", "n_shared", "near_dup")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.length === 1000)
    val copies = rows.filter(_._1 >= 10000)
    // every planted copy shares fingerprints with its source
    assert(copies.forall(_._3 > 0))
    assert(copies.count(_._4) === copies.length)
    assert(rows.forall(r => r._3 <= r._2))
  }

  test("x112 DSIR: lambda law, Gumbel determinism, ordering") {
    val out = ExtQueries.queries("x112_dsir")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 100)
    // rnk is the 1..100 order of score_e6 desc
    assert(out.map(_._7).toSeq === (1L to 100L))
    val scores = out.map(_._6)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // score decomposes exactly
    assert(out.forall(r => r._6 === r._3 + r._5))
    // deterministic re-run
    val again = ExtQueries.queries("x112_dsir")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === again.toSeq)
    // en docs are the target: selected docs skew en (weights reward
    // target-like feature mass)
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val enAll = langs.valuesIterator.count(_ == "en").toDouble / langs.size
    val enSel = out.count(r => langs(r._1) == "en").toDouble / out.length
    assert(enSel > enAll)
  }

  test("x113 capture-recapture: Chapman identity and sane estimate") {
    val r = ExtQueries.queries("x113_caprecap")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val (nRows, n1, n2, m, est, trueD, dupPpm, trueDupPpm) = r
    assert(trueD === 500L)
    assert(est === (n1 + 1) * (n2 + 1) / (m + 1) - 1)
    assert(m <= math.min(n1, n2) && n1 <= trueD && n2 <= trueD)
    // 40% text-level captures: both counts in a generous band
    assert(n1 > 120 && n1 < 280 && n2 > 120 && n2 < 280)
    // estimate within 25% of truth on this corpus
    assert(math.abs(est - trueD) <= trueD / 4)
    assert(dupPpm >= 0 && dupPpm <= 1000000L)
    assert(trueDupPpm === (nRows - trueD) * 1000000L / nRows)
  }

  test("x115 LSH planner: S-curve laws over the factorization grid") {
    val rows = ExtQueries.queries("x115_lsh_planner")(spark, dir)
      .select("r", "b", "s_low_ppm", "s_high_ppm", "t_e6",
        "p_low_e6", "p_high_e6", "cost_e6", "is_best")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect()
    assert(rows.length === 8)
    assert(rows.forall(r => r._1 * r._2 === 128L))
    assert(rows.count(_._9) === 1)
    // collision probability is monotone in s: p(s_high) >= p(s_low)
    rows.foreach(r => assert(r._7 >= r._6))
    // cost identity and the best row attains the minimum
    rows.foreach(r => assert(r._8 === r._6 + (1000000L - r._7)))
    val best = rows.filter(_._9).head
    assert(rows.forall(_._8 >= best._8))
    // truncation near-dups measure high Jaccard: s_high > 0.5
    assert(best._4 > 500000L && best._3 === best._4 / 2)
    // r=1 (b=128) catches everything at both points; r=128 nothing
    val r1 = rows.find(_._1 == 1L).get
    val r128 = rows.find(_._1 == 128L).get
    assert(r1._7 > 900000L && r128._7 < r1._7)
  }

  test("x116 vocab coverage: crossing rows bracket their targets") {
    val rows = ExtQueries.queries("x116_vocab_coverage")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(50L, 90L, 95L, 99L))
    // coverage at the crossing row is >= the target percent
    rows.foreach { case (pct, _, _, covPpm) =>
      assert(covPpm >= pct * 10000L)
    }
    // more coverage needs (weakly) more vocabulary, and the curve is
    // concave enough that 99% needs strictly more than 50%
    val sizes = rows.map(_._2)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a <= b })
    assert(sizes.last > sizes.head)
  }

  test("x117 capped mixing: caps bind, budget respected, cascade real") {
    // sf0.01: the one corpus where the second water-filling wave caps
    // a source the first did not (sf0.001's masses one-wave out)
    val rows = ExtQueries
      .queries("x117_capped_mixing")(spark, "/root/testdata/sf0.01")
      .select("source", "n_tokens", "pw_e6", "cap_tokens",
        "alloc_tokens", "epochs_ppm", "capped")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length === 20)
    val (cap, free) = rows.partition(_._7)
    // the cap binds on SOME sources and not others (non-degenerate)
    assert(cap.nonEmpty && free.nonEmpty)
    // capped sources sit exactly at 2 epochs; free ones strictly below
    cap.foreach(r => assert(r._5 === r._4 && r._6 === 2000000L))
    free.foreach(r => assert(r._5 < r._4 && r._6 < 2000000L))
    // nothing allocates past the budget (integer-div slack only)
    val total = rows.map(_._2).sum
    assert(rows.map(_._5).sum <= total * 3 / 2)
    // the cascade is real: re-running water-filling in plain Scala,
    // round 2 must cap at least one source round 1 did not
    def wave(capped0: Set[String]): Set[String] = {
      val capsum = rows.filter(r => capped0(r._1)).map(_._4).sum
      val zsum = math.max(
        rows.filterNot(r => capped0(r._1)).map(_._3).sum, 1L)
      rows.filterNot(r => capped0(r._1)).filter { r =>
        r._3 * (total * 3 / 2 - capsum) / zsum >= r._4
      }.map(_._1).toSet
    }
    val w1 = wave(Set.empty)
    val w2 = wave(w1)
    assert(w1.nonEmpty && w2.nonEmpty,
      s"expected a two-wave cascade, got w1=$w1 w2=$w2")
    assert((w1 ++ w2 ++ wave(w1 ++ w2)) === cap.map(_._1).toSet)
  }

  test("x118 self-repetition surgery: echoes excised, sources untouched") {
    val rows = ExtQueries.queries("x118_self_repetition")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    assert(rows.length === 1000)
    val base = rows.filter(_._1 < 10000).map(r => r._1 -> r).toMap
    val echoed = rows.filter(_._1 >= 10000)
    echoed.foreach { e =>
      val b = base(e._1 - 10000)
      // surgery returns the echoed copy to EXACTLY its source's form
      assert(e._4 === b._4, s"pair ${e._1}")
      // the excised mass is the echo block: min(12, source length)
      assert(e._3 - b._3 === math.min(12L, b._2), s"pair ${e._1}")
    }
    // this corpus has no natural 8-gram self-repeats — sources pass
    // through whole (a fixture fact the pair deltas above rely on)
    assert(base.values.forall(_._3 === 0L))
  }

  test("x119 curriculum interleave: round-robin law over deciles") {
    val rows = ExtQueries.queries("x119_curriculum_interleave")(spark, dir)
      .select("doc_id", "score_ppm", "rnk", "decile", "wrank", "pos")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 500)
    // positions are unique; ranks are the 1..N permutation
    assert(rows.map(_._6).distinct.length === rows.length)
    assert(rows.map(_._3).sorted.toSeq === (1L to 500L))
    // decile arithmetic from the rank, recomputed
    rows.foreach { r =>
      assert(r._4 === (r._3 - 1) * 10 / 500)
      assert(r._5 === r._3 - r._4 * 500 / 10)
      assert(r._6 === (r._5 - 1) * 10 + r._4)
    }
    // the first 10 curriculum slots hold one doc from EACH decile
    val firstTen = rows.sortBy(_._6).take(10).map(_._4).toSet
    assert(firstTen === (0L to 9L).toSet)
    // ordering by rank within each decile is preserved
    rows.groupBy(_._4).values.foreach { g =>
      val byPos = g.sortBy(_._6).map(_._3)
      assert(byPos.zip(byPos.tail).forall { case (a, b) => a < b })
    }
  }

  test("x120 rank blend: blend is the mean of per-signal percentiles") {
    val rows = ExtQueries.queries("x120_quality_rank_blend")(spark, dir)
      .select("doc_id", "r1", "r2", "r3", "blend_ppm", "keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length === 500)
    val n = rows.length.toLong
    rows.foreach { r =>
      val ppm = Seq(r._2, r._3, r._4)
        .map(rk => (rk - 1) * 1000000L / (n - 1)).sum / 3
      assert(r._5 === ppm)
      assert(r._6 === (ppm >= 500000L))
    }
    // each rank column is a permutation of 1..N (ties broken by id)
    Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4)).foreach { rs =>
      assert(rs.sorted.toSeq === (1L to n))
    }
    // the gate splits the corpus near the median, both sides populated
    val kept = rows.count(_._6)
    assert(kept > 100 && kept < 400)
  }

  test("x121 RAG chunks: coverage, stride and content identity") {
    val rows = ExtQueries.queries("x121_rag_chunks")(spark, dir)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size === 500)
    byDoc.foreach { case (_, chunks) =>
      val n = chunks.head._2
      val sorted = chunks.sortBy(_._3)
      // stride law: starts are 0, 24, 48, ...
      assert(sorted.map(_._4).toSeq ===
        sorted.indices.map(_ * 24L))
      // expected chunk count
      val k = if (n <= 32) 1L else (n - 32 + 23) / 24 + 1
      assert(sorted.length.toLong === k)
      // coverage: the last chunk reaches the end of the doc
      val last = sorted.last
      assert(last._4 + last._5 === n)
      // every chunk length is exact
      sorted.foreach(c => assert(c._5 === math.min(32L, n - c._4)))
      // consecutive chunks overlap by 8 (except a short final chunk)
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4 - a._4 === 24L && a._4 + a._5 > b._4)
        case _ =>
      }
    }
    // chunk content is the real slice: recompute one doc's md5s
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 7L).select("text").as[String].head()
    val toks = doc.trim.split("\\s+").toSeq
    val expect = (0L until byDoc(7L).length.toLong).map { i =>
      val start = (i * 24).toInt
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(toks.slice(start, start + 32).mkString(" ")
        .getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    assert(byDoc(7L).sortBy(_._3).map(_._6).toSeq === expect)
  }

  test("x122 split leakage: naive > group > component == 0") {
    val rows = ExtQueries.queries("x122_split_leakage")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq("component", "group", "naive"))
    val byS = rows.map(r => r._1 -> r).toMap
    // same discovered-pair set audited by all three
    assert(rows.map(_._2).distinct.length === 1 && rows.head._2 > 400)
    // the ordering the op exists to demonstrate
    assert(byS("component")._3 === 0L)
    assert(byS("group")._3 > 0L, "expected discovered cross-source dups")
    assert(byS("naive")._3 > byS("group")._3)
    // naive hash split at p=0.2 leaks ~2p(1-p)=32% of pairs; wide band
    val naivePpm = byS("naive")._4
    assert(naivePpm > 200000L && naivePpm < 450000L)
  }

  test("x123 action transitions: absorbing END, smoothed mass law") {
    val rows = ExtQueries.queries("x123_action_transitions")(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
    val froms = rows.map(_._1).distinct
    // END is absorbing: never a from-state, reachable from every from
    assert(!froms.contains("END"))
    froms.foreach { f =>
      assert(rows.exists(r => r._1 == f && r._2 == "END"),
        s"$f has no END transition — some session must end on it")
    }
    // row_total consistency and the smoothing identity per cell
    val v = froms.length.toLong
    rows.groupBy(_._1).foreach { case (_, g) =>
      val rt = g.head._4
      assert(g.map(_._3).sum === rt)
      g.foreach(r => assert(r._5 === (r._3 + 1) * 1000000L / (rt + v + 1)))
      // observed smoothed mass stays under 1e6 (unseen cells hold the
      // remainder — the point of the smoothing)
      assert(g.map(_._5).sum <= 1000000L)
    }
    // transition counts balance: non-END targets' inbound == outbound
    // minus session starts/ends is corpus-specific; pin the global
    // identity instead — total transitions == total events
    val nEvents = Tables(spark, dir, "events").count()
    assert(rows.map(_._3).sum === nEvents)
  }

  test("x114 temperature mixing: renormalization and direction") {
    val rows = ExtQueries.queries("x114_temperature_mix")(spark, dir)
      .select("p_ppm", "pw_e6", "w_ppm", "epochs_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 20)
    // w renormalizes to ~1e6 (integer-div truncation, one part per
    // source at most)
    val wSum = rows.map(_._3).sum
    assert(wSum <= 1000000L && wSum >= 1000000L - rows.length)
    // sqrt law: pw_e6^2 ≈ p_ppm·1e6 within quantization
    rows.foreach { case (p, pw, _, _) =>
      assert(math.abs(pw.toDouble * pw - p.toDouble * 1e6) < 3e9)
    }
    // α=0.5 flattens: sources above the mean share train at <1 epoch
    // relative rate, below-mean sources at >1
    val meanP = rows.map(_._1).sum / rows.length
    rows.foreach { case (p, _, _, ep) =>
      if (p > meanP * 3 / 2) assert(ep < 1000000L)
      if (p < meanP / 2) assert(ep > 1000000L)
    }
  }
}
