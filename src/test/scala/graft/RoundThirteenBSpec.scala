package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operator semantics beyond the oracle hash: FIM rendering
  * laws, bitext-margin recall of the planted translations, the Luhn
  * validator on the classic spec fixtures, Matryoshka truncation
  * bounds, and a plain-Scala recompute of a bootstrap replica.
  */
class RoundThirteenBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x125: FIM rendering reassembles from the cuts; AR rows untouched") {
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("x125_fim_transform")(spark, dir)
      .as[(Long, String, Long, Long, Long, String)].collect()
    assert(rows.length === docs.size)
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var nFim = 0
    rows.foreach { case (id, mode, a, b, nOut, h) =>
      val t = docs(id).split("\\s+").toSeq
      assert(0 <= a && a <= b && b <= t.length)
      if (mode == "fim") {
        nFim += 1
        assert(nOut === t.length + 3)
        val expect = "<PRE> " + t.take(a.toInt).mkString(" ") +
          " <SUF> " + t.drop(b.toInt).mkString(" ") +
          " <MID> " + t.slice(a.toInt, b.toInt).mkString(" ")
        assert(h === md5(expect), s"doc $id FIM render")
      } else {
        assert(nOut === t.length)
        assert(h === md5(t.mkString(" ")), s"doc $id AR render")
      }
    }
    // the md5 coin is fair-ish: both modes well represented
    assert(nFim > rows.length / 4 && nFim < rows.length * 3 / 4)
  }

  test("x126: margin mining — twins at rank 1, mined set is high-precision") {
    val rows = SparkEntry.queries("x126_bitext_margin")(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val planted = rows.filter(_._1 % 4 == 0)
    assert(planted.nonEmpty)
    // rank-1 recall: the twin wins its source's ranking unless the
    // quantization flipped an LSH sign bit (single-probe recall limit)
    val twinAt1 = planted.count(r => r._2 === r._1 + 1000000L)
    assert(twinAt1 >= planted.length * 95 / 100,
      s"twin rank-1 recall $twinAt1/${planted.length}")
    planted.filter(r => r._2 == r._1 + 1000000L).foreach { r =>
      assert(r._3 >= 999000L, s"src ${r._1} twin cosine ${r._3}")
    }
    // a twin ALONE in its bucket has margin exactly 1.0 (neighborhood
    // == the pair) — so mined is a high-precision SUBSET of planted:
    // zero distractors mined, most twins mined
    val distractor = rows.filter(_._1 % 4 != 0)
    assert(distractor.count(_._5) === 0,
      "distractor pairs crossed the margin threshold")
    val minedTwins = planted.count(r => r._5 && r._2 == r._1 + 1000000L)
    assert(minedTwins >= planted.length * 6 / 10,
      s"mined twin fraction $minedTwins/${planted.length}")
  }

  test("x127: the Luhn fold agrees with the ISO 7812 spec fixtures") {
    // the classic test numbers: 4111111111111111 valid, +1 invalid,
    // 79927398713 is the spec's worked example (11 digits — below the
    // 13-digit detection floor, so also a length-gate fixture)
    val runOk = "aggregate(sequence(1, length(r)), CAST(0 AS BIGINT), " +
      "(acc, i) -> acc + CASE WHEN (length(r) + 1 - i) % 2 = 0 THEN " +
      "IF(2 * CAST(substring(r, i, 1) AS INT) > 9, " +
      "2 * CAST(substring(r, i, 1) AS INT) - 9, " +
      "2 * CAST(substring(r, i, 1) AS INT)) " +
      "ELSE CAST(substring(r, i, 1) AS INT) END) % 10 = 0"
    val got = Seq("4111111111111111", "4111111111111112",
      "79927398713", "1234567812345670")
      .toDF("r").withColumn("ok", expr(runOk))
      .as[(String, Boolean)].collect().toMap
    assert(got("4111111111111111") === true)
    assert(got("4111111111111112") === false)
    assert(got("79927398713") === true)
    assert(got("1234567812345670") === true) // 15-digit payload 1..8,1..5 + check 0
  }

  test("x127: planted valid cards are caught, planted invalid ones rejected") {
    val rows = SparkEntry.queries("x127_luhn_pii")(spark, dir)
      .as[(Long, Long, Long, String)].collect()
    rows.foreach { case (id, nRuns, nValid, _) =>
      assert(nValid <= nRuns)
      if (id % 3 == 0) assert(nValid >= 1, s"doc $id missed its valid card")
      else assert(nValid === 0, s"doc $id false positive")
      if (id % 5 == 0 && id % 3 != 0)
        assert(nRuns >= 1, s"doc $id invalid plant not even detected as a run")
    }
  }

  test("x128: truncation degrades retrieval measurably but not totally") {
    val rows = SparkEntry.queries("x128_matryoshka_eval")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, overlap, disp) =>
      assert(overlap >= 0 && overlap <= 10)
      // both ranks ≤ 10 on common members → per-member displacement ≤ 9
      assert(disp <= 9 * overlap)
    }
    val meanOverlap = rows.map(_._2).sum.toDouble / rows.length
    assert(meanOverlap > 0.5, s"16-dim truncation lost everything: $meanOverlap")
    assert(meanOverlap < 10.0, s"truncation changed nothing: $meanOverlap")
  }

  test("x130: Heaps curve is monotone, β in the sublinear band, fit recomputes") {
    val rows = SparkEntry.queries("x130_heaps_fit")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length === 16)
    // cumulative prefixes: both masses non-decreasing, final = corpus
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted)
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted)
    // vocabulary growth is sublinear but real: 0 < β < 1
    val beta = rows.head._4
    assert(rows.forall(_._4 == beta))
    assert(beta > 0.1 && beta < 1.0, s"heaps beta $beta")
    // the fit is reproducible from the emitted points themselves
    def q(v: Long): Double =
      math.round(BigDecimal(math.log(v.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6).toDouble
    val (xs, ys) = (rows.map(r => q(r._2)), rows.map(r => q(r._3)))
    val n = xs.length
    val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) / (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
    assert(math.abs(slope - beta) < 0.001, s"fit $slope vs emitted $beta")
  }

  test("x131: rendering and mask spans recompute per session") {
    val rows = SparkEntry.queries("x131_sft_render")(spark, dir)
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(rows.nonEmpty)
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // independent rebuild from the raw events for a sample of sessions
    val ev = Tables(spark, dir, "events")
      .select($"user_id", $"event_id",
        expr("unix_micros(CAST(ts AS TIMESTAMP))"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    ev.take(25).foreach { case (uid, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      // 30-minute sessionization on epoch micros (ts cast to long)
      var sid = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map[Long,
        scala.collection.mutable.ArrayBuffer[String]]()
      ordered.foreach { e =>
        if (prev == Long.MinValue || e._3 - prev > 1800000000L) sid += 1
        prev = e._3
        sessions.getOrElseUpdate(sid,
          scala.collection.mutable.ArrayBuffer[String]()) += e._4
      }
      sessions.foreach { case (sess, types) =>
        val pieces = types.zipWithIndex.map { case (ty, i) =>
          (if (i % 2 == 0) "<|user|> " else "<|assistant|> ") + ty + "\n"
        }
        val offs = pieces.scanLeft(0L)(_ + _.length)
        val spans = types.zipWithIndex.collect { case (ty, i) if i % 2 == 1 =>
          val off = offs(i)
          s"${off + "<|assistant|> ".length}:${off + pieces(i).length - 1}"
        }
        val got = byKey((uid, sess))
        assert(got._3 === types.length.toLong, s"user $uid sess $sess turns")
        assert(got._4 === types.zipWithIndex
          .collect { case (ty, i) if i % 2 == 1 => ty.length.toLong }.sum)
        assert(got._5 === md5(pieces.mkString("")), s"user $uid sess $sess render")
        assert(got._6 === md5(spans.mkString(",")), s"user $uid sess $sess spans")
      }
    }
  }

  test("x129: replica 0 recomputes in plain Scala; ranks are a permutation") {
    val rows = SparkEntry.queries("x129_poisson_bootstrap")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 16)
    assert(rows.map(_._4).sorted.toSeq === (1L to 16L))
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", size(split($"text", "\\s+")).cast("long"))
      .as[(Long, Long)].collect()
    def u(id: Long, b: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#boot$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % 1000000L
    }
    def w(u: Long): Long =
      if (u < 367879L) 0 else if (u < 735759L) 1 else if (u < 919699L) 2
      else if (u < 981012L) 3 else if (u < 996340L) 4 else 5
    val (sw, swx) = docs.foldLeft((0L, 0L)) { case ((a, b2), (id, x)) =>
      val wi = w(u(id, 0)); (a + wi, b2 + wi * x)
    }
    val expect = (swx * 1000000L) / math.max(sw, 1L)
    val got = rows.find(_._1 == 0L).get
    assert(got._2 === sw && got._3 === expect)
    // Poisson(1) weights: n_eff within a generous band of n docs
    assert(sw > docs.length / 2 && sw < docs.length * 2)
  }
}
