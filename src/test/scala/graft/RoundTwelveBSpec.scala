package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{BradleyTerry, Text}
import graft.queries.ExtQueries

/** Round-12 session-3 operators:
  *  - UnicodeNormalize (10th native expression): UAX #15 forms,
  *    null propagation, SQL registration;
  *  - BradleyTerry: the integer MM law against an independent plain-
  *    Scala recompute (the driver-side exact-recompute discipline),
  *    and planted-order recovery from synthetic judgments;
  *  - x105 ECE: internal consistency of the exact-integer calibration
  *    table (bins, bounds, and the ECE identity over the gap column);
  *  - x107 context packing: per-user pairs rebuilt independently from
  *    the raw event sequence;
  *  - x108 retrieval eval: gold always retrieved, MRR identity, and
  *    self-retrieval precision on rarest-term queries.
  */
class RoundTwelveBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("UnicodeNormalize: NFC composes, NFD decomposes, NFKC folds") {
    val df = Seq(("a\u0301", "caf\u00e9", "\ufb01sh")).toDF("d", "c", "k")
    val r = df.select(
      Text.unicodeNormalize(col("d"), "NFC").as("nfc"),
      length(Text.unicodeNormalize(col("d"), "NFC")).as("n1"),
      Text.unicodeNormalize(col("c"), "NFD").as("nfd"),
      length(Text.unicodeNormalize(col("c"), "NFD")).as("n2"),
      Text.unicodeNormalize(col("k"), "NFKC").as("nfkc"))
      .as[(String, Int, String, Int, String)].head()
    assert(r._1 === "\u00e1" && r._2 === 1) // a + U+0301 -> \u00e1
    assert(r._3 === "cafe\u0301" && r._4 === 5) // e\u0301 decomposed
    assert(r._5 === "fish")              // U+FB01 ligature folds
  }

  test("UnicodeNormalize: null in, null out; idempotent on NFC text") {
    val df = Seq((Some("r\u00e9sum\u00e9"), None: Option[String]))
      .toDF("s", "n")
    val r = df.select(
      Text.unicodeNormalize(col("s")).as("a"),
      Text.unicodeNormalize(Text.unicodeNormalize(col("s"))).as("b"),
      Text.unicodeNormalize(col("n")).as("c"))
      .as[(String, String, Option[String])].head()
    assert(r._1 === "r\u00e9sum\u00e9")
    assert(r._1 === r._2)
    assert(r._3.isEmpty)
  }

  test("unicode_normalize is SQL-registered with literal-form check") {
    val got = spark.sql("SELECT unicode_normalize('a\\u0301', 'NFC')")
      .as[String].head()
    assert(got === "\u00e1")
    val err = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("nfx") ||
      err.getMessage.toLowerCase.contains("normalization"))
  }

  /** Plain-Scala mirror of BradleyTerry.fit's integer MM arithmetic —
    * an independent single-threaded recompute of the same law.
    */
  private def mmScala(
      pairs: Seq[(Long, Long, Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val items = pairs.flatMap { case (lo, hi, n, wLo) =>
      Seq((lo, wLo, n), (hi, n - wLo, n)) }
      .groupBy(_._1).map { case (i, g) =>
        i -> (g.map(_._2).sum, g.map(_._3).sum) }
    var s = items.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val dsum = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      pairs.foreach { case (lo, hi, n, _) =>
        val d = (n * 1000000000000L) / (s(lo) + s(hi))
        dsum(lo) += d; dsum(hi) += d
      }
      s = items.map { case (i, (w, _)) =>
        val den = dsum(i) + 2000000000000L / (s(i) + 1000000L)
        i -> math.max(((w + 1) * 1000000000000L) / den, 1L)
      }
    }
    s
  }

  test("BradleyTerry: fit matches the plain-Scala integer MM recompute") {
    val pairs = Seq(
      (0L, 1L, 4L, 3L),   // item 0 beats 1, 3 of 4
      (0L, 2L, 5L, 1L),   // item 2 beats 0, 4 of 5
      (1L, 2L, 3L, 0L),   // item 2 sweeps 1
      (3L, 4L, 2L, 2L))   // item 3 sweeps 4 (4 has zero wins)
      .toDF("lo", "hi", "n", "w_lo")
    val got = BradleyTerry.fit(pairs, iters = 4)
      .select($"item", $"s_e6").as[(Long, Long)].collect().toMap
    val want = mmScala(
      Seq((0L, 1L, 4L, 3L), (0L, 2L, 5L, 1L), (1L, 2L, 3L, 0L),
        (3L, 4L, 2L, 2L)), iters = 4)
    assert(got === want)
    // the dominant item of the 0/1/2 tournament is 2; zero-win item 4
    // stays finite and positive (ghost game + floor)
    assert(got(2L) > got(0L) && got(0L) > got(1L))
    assert(got(4L) >= 1L && got(4L) < got(3L))
  }

  test("BradleyTerry: recovers a planted ordering from md5 judgments") {
    // 4000 synthetic judgments over 20 items, p(a wins) =
    // (a+1)/(a+b+2) — the x106 construction at a denser sample
    val games = spark.range(4000).toDF("doc_id")
      .select(col("doc_id"),
        (col("doc_id") % 20).as("ia"),
        ((col("doc_id") * 31 + 7) % 20).as("ib"))
      .filter(col("ia") =!= col("ib"))
      .withColumn("u_ppm",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || '#bt')," +
          " 1, 8), 16, 10) AS BIGINT) % 1000000"))
      .withColumn("a_wins",
        col("u_ppm") * (col("ia") + col("ib") + 2) <
          (col("ia") + 1) * 1000000L)
    val pairs = games
      .withColumn("lo", least(col("ia"), col("ib")))
      .withColumn("hi", greatest(col("ia"), col("ib")))
      .withColumn("lo_win",
        when(col("a_wins") === (col("ia") === col("lo")), 1L)
          .otherwise(0L))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), sum(col("lo_win")).as("w_lo"))
    val s = BradleyTerry.fit(pairs, iters = 5)
      .select($"item", $"s_e6").as[(Long, Long)].collect().toMap
    val top5 = (15L to 19L).map(s).sum / 5.0
    val bot5 = (0L to 4L).map(s).sum / 5.0
    assert(top5 > 2 * bot5,
      s"planted order not recovered: top5=$top5 bot5=$bot5")
  }

  test("x105 ECE table is internally consistent") {
    val r = ExtQueries.queries("x105_calibration_ece")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    val n = r.map(_._2).sum
    // holdout size: docs with doc_id % 3 != 0 and a nonempty token set
    val ho = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 3 =!= 0).count()
    assert(n === ho)
    r.foreach { case (bin, nb, npos, conf, acc, gap, _) =>
      assert(bin >= 0 && bin <= 9)
      assert(npos >= 0 && npos <= nb)
      assert(conf >= 0 && conf <= 1000000L)
      assert(acc >= 0 && acc <= 1000000L)
      assert(gap >= 0)
    }
    // ECE identity: the reported constant equals sum(gap) div sum(n)
    val ece = r.head._7
    assert(ece === r.map(_._6).sum / n)
  }

  test("x107 pairs match an independent per-user rebuild") {
    val got = ExtQueries.queries("x107_context_windows")(spark, dir)
      .as[(Long, Long, Long, String, String)].collect()
      .groupBy(_._1)
    val events = Tables(spark, dir, "events")
      .select($"user_id", $"event_id", $"ts".cast("string"), $"event_type")
      .as[(Long, Long, String, String)].collect()
      .groupBy(_._1)
    events.foreach { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2)).toSeq
      val want = ordered.zipWithIndex.drop(1).map { case (e, i) =>
        val ctx = ordered.slice(math.max(0, i - 4), i).map(_._4)
        (u, (i + 1).toLong, e._2, ctx.mkString(" "), e._4)
      }
      val g = got.getOrElse(u, Array.empty).sortBy(_._2).toSeq
      assert(g === want, s"user $u context pairs diverge")
    }
  }

  test("x108: gold always retrieved, MRR identity, rare terms precise") {
    val r = ExtQueries.queries("x108_retrieval_eval")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, nCands, goldRank, rr, h1, h5, h10, _) =>
      assert(goldRank >= 1 && goldRank <= nCands)
      if (goldRank <= 10) assert(rr === 1000000L / goldRank) else assert(rr === 0L)
      assert(h5 >= h1 && h10 >= h5)
    }
    val mrr = r.head._8
    assert(mrr === r.map(_._4).sum / r.length)
    // NOTE: no precision floor is asserted — on this synthetic corpus
    // the whole vocabulary (~310 types) is shared across documents, so
    // even a doc's 3 rarest terms barely discriminate; the eval op's
    // job is to REPORT that (low MRR on an undiscriminating index),
    // not to guarantee it away.
  }

  /** Plain-Scala mirror of x109's quantized inverse-CDF Laplace draw. */
  private def lapScala(uPpm: Long, b: Double): Long = {
    val v = uPpm - 500000L
    val arg = math.max(1000000L - math.abs(v) * 2L, 1L)
    val q = BigDecimal(math.log(arg / 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    BigDecimal(math.signum(v.toDouble) * -b * q)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  test("x109 DP noise matches the plain-Scala Laplace recompute") {
    val r = ExtQueries.queries("x109_dp_stats")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, n, clipSum, u1, u2, dpN, dpSum, dpMean) =>
      assert(dpN - n === lapScala(u1, 2.0))
      assert(dpSum - clipSum === lapScala(u2, 512.0))
      assert(dpMean ===
        math.max(dpSum, 0L) * 1000000L / math.max(dpN, 1L))
    }
    // clipping really binds somewhere (sensitivity bound is live)
    val docs = Tables(spark, dir, "documents")
    assert(docs.filter(col("n_chars") > 256).count() > 0)
  }

  test("x110 HRW: growth moves ONLY winners of the new shard") {
    val r = ExtQueries.queries("x110_rendezvous_sharding")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(r.nonEmpty)
    // the defining minimal-movement property: moved <=> new shard won
    r.foreach { case (_, s8, s9, moved) =>
      assert(moved === (s9 === 8L))
      if (!moved) assert(s8 === s9)
      assert(s8 >= 0 && s8 <= 7 && s9 >= 0 && s9 <= 8)
    }
    // expected moved fraction 1/9 ≈ 11.1%; allow a wide binomial band
    val frac = r.count(_._4).toDouble / r.length
    assert(frac > 0.03 && frac < 0.25, s"moved fraction $frac")
  }
}
