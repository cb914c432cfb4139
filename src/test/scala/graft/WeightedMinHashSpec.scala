package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Text}

/** x98 idf-weighted MinHash (integer-weight consistent sampling):
  *  - expansion law: each shingle occupies exactly idfWeight(df)
  *    expansion slots, all elements distinct, so plain-set machinery
  *    (MinHash, intersect-size) over the expanded sets computes the
  *    weighted quantities exactly;
  *  - weighted-overlap law: |expA ∩ expB| = Σ_s min(w_a(s), w_b(s)),
  *    hand-checked on a fixture;
  *  - the boilerplate FLIP the operator exists for: a corpus where
  *    every doc shares a footer makes unweighted Jaccard flag
  *    unrelated pairs as near-dups (raw j ≥ 0.5) while the weighted
  *    verdict correctly rejects them (jw < 0.25) AND keeps the true
  *    content near-dup pair.
  */
class WeightedMinHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingled(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("t", Text.tokens(col("text")))
      .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))

  test("expansion law: exp size = Σ idfWeight(df), elements distinct") {
    // shingle dfs in this fixture: "a b c" df=2 → w=3, "b c d" df=1 →
    // w=4, "c d e" df=2 → w=3, "d e f" df=1 → w=4
    val docs = Seq(
      (1L, "a b c d e"), // shingles: abc, bcd, cde
      (2L, "a b c"),     // abc
      (3L, "c d e f"))   // cde, def
    val ws = Dedup.weightedShingles(shingled(docs), "doc_id", "s")
      .select(col("id"), col("s"), col("exp"))
      .as[(Long, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> r).toMap
    // df: abc=2, bcd=1, cde=2, def=1 → weights 3, 4, 3, 4
    assert(ws(1L)._3.toSet.size === ws(1L)._3.size)
    assert(ws(1L)._3.size === 3 + 4 + 3) // abc(3) + bcd(4) + cde(3)
    assert(ws(2L)._3.size === 3)         // abc(3)
    assert(ws(3L)._3.size === 3 + 4)     // cde(3) + def(4)
    // expanded elements are shingle~slot, slots 1..w
    assert(ws(2L)._3.toSet === Set("a b c~1", "a b c~2", "a b c~3"))
  }

  test("weighted-overlap law: |expA ∩ expB| = Σ min(w_a, w_b)") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c"), (3L, "c d e f"))
    val ws = Dedup.weightedShingles(shingled(docs), "doc_id", "s")
    val pair = ws.as("a").join(ws.as("b"),
        col("a.id") === 1L && col("b.id") === 3L)
      .select(Dedup.intersectSize(col("a.exp"), col("b.exp")).as("m"))
      .as[Long].head()
    // shared shingle: cde only, df=2 → weight 3 on both sides → Σmin=3
    assert(pair === 3L)
  }

  test("boilerplate flip: raw Jaccard false-positives, weighted rejects; true pair kept") {
    val boiler = "all rights reserved terms of service apply contact " +
      "us for more information subscribe to our newsletter weekly " +
      "updates privacy policy here" // 22 tokens → 20 pure-boiler shingles
    def content(i: Int) = (0 until 9).map(j => s"c${i}w$j").mkString(" ")
    // docs 1..8: distinct 9-token content + shared footer — footer is
    // ~2/3 of every shingle set, so RAW Jaccard of unrelated pairs is
    // 20/38 ≈ 0.53 (a false positive at the standard 0.5 bar) while
    // the weighted verdict is 20/92 ≈ 0.22. docs 9, 10: same content,
    // one trailing token apart (the true near-dup, jw ≈ 0.85).
    val rows = (1 to 8).map(i => (i.toLong, s"${content(i)} $boiler")) ++
      Seq((9L, s"${content(99)} $boiler"),
        (10L, s"${content(99)} $boiler zz"))
    val sh = shingled(rows)

    // unweighted verdicts at the standard 0.5 threshold: unrelated
    // footer-sharing pairs clear it (the false positive)
    val raw = Dedup.nearDupPairs(sh, "doc_id", "s",
        numHashes = 16, bands = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(raw.exists { case (_, b) => b <= 8 },
      s"expected a footer-only false positive among docs 1..8, got $raw")

    // weighted verdicts: nothing but the true content pair survives
    val w = Dedup.weightedNearDupPairs(sh, "doc_id", "s",
        numHashes = 16, bands = 4, thresholdPpm = 250000L)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(w === Set((9L, 10L)), w.mkString(", "))

    // and the verdicts are the weighting, not banding luck: exact
    // numbers straight from the arrays for a footer-only pair (raw
    // false positive, weighted reject) and the true pair (weighted keep)
    val ws = Dedup.weightedShingles(sh, "doc_id", "s")
    def verdicts(a: Long, b: Long): (Double, Double) = {
      val v = ws.as("a").join(ws.as("b"),
          col("a.id") === a && col("b.id") === b)
        .select(
          Dedup.intersectSize(col("a.exp"), col("b.exp")).cast("long").as("wmin"),
          (size(col("a.exp")) + size(col("b.exp"))).cast("long").as("wsz"),
          Dedup.intersectSize(col("a.s"), col("b.s")).cast("long").as("inter"),
          (size(col("a.s")) + size(col("b.s"))).cast("long").as("sz"))
        .as[(Long, Long, Long, Long)].head()
      (v._1.toDouble / (v._2 - v._1), v._3.toDouble / (v._4 - v._3))
    }
    val (jwFp, jrawFp) = verdicts(1L, 2L)
    assert(jrawFp >= 0.5, s"fixture should raw-collide: $jrawFp")
    assert(jwFp < 0.25, s"weighting should reject: $jwFp")
    val (jwTrue, _) = verdicts(9L, 10L)
    assert(jwTrue >= 0.25, s"true pair should survive weighting: $jwTrue")
  }

  test("df-cut: shingles above ubiquityCap vanish from the weighted universe") {
    // 70 docs share a footer (df=70 > 64) — above the cap, so the
    // footer contributes NOTHING: no expansion slots, no candidates,
    // no Σmin. Docs 100/101 additionally share rare content.
    val boiler = "aa bb cc dd ee ff gg hh"
    val rows = (1 to 68).map(i =>
      (i.toLong, s"u${i}x u${i}y u${i}z $boiler")) ++
      Seq((100L, s"q1 q2 q3 q4 q5 $boiler"), (101L, s"q1 q2 q3 q4 q5 $boiler"))
    val sh = shingled(rows)
    val ws = Dedup.weightedShingles(sh, "doc_id", "s")
    // no expanded element anywhere contains a footer-only shingle
    val footerish = ws.select(explode(col("exp")).as("e"))
      .filter(col("e").startsWith("cc dd ee") || col("e").startsWith("dd ee ff"))
      .count()
    assert(footerish === 0L)
    // footer-only pairs never become candidates even at threshold 0;
    // the true content pair does, with Σmin from content alone
    val pairs = Dedup.weightedNearDupPairs(sh, "doc_id", "s",
        numHashes = 16, bands = 4, thresholdPpm = 0L)
      .select(col("doc_a"), col("doc_b"), col("wmin"))
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((100L, 101L)))
    // shared mass = the 3 pure-content trigrams (df=2 → w=3) plus the
    // content→footer boundary trigrams (df=2 → w=3): all of it rare
    assert(pairs.head._3 > 0L && pairs.head._3 % 3 === 0L)
  }
}
