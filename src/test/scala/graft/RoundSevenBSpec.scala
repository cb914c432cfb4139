package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ExtQueries, RelationalQueries}

/** Round-7 second batch: CCNet-style per-language quality buckets
  * (x66), the PPJoin prefix-filter set-similarity join (x67), the
  * leakage-free temporal split (x68), the Zipf-slope fit (x69) and the
  * Q18/Q8-shaped relational queries (q38/q39). The DuckDB oracle pins
  * exact values at sf0.01; these tests pin the semantic invariants on
  * sf0.001 — completeness vs brute force for x67 (the property prefix
  * filtering is FOR), ordering/quota laws for the rest.
  */
class RoundSevenBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def runx(name: String) = ExtQueries.queries(name)(spark, dir)
  private def runq(name: String) = RelationalQueries.queries(name)(spark, dir)

  test("x66: thirds per language, and buckets are ordered by score") {
    val rows = runx("x66_ccnet_buckets")
      .select($"doc_id", $"lang", $"avg_logp", $"bucket")
      .as[(Long, String, Double, String)].collect()
    val docs = Tables(spark, dir, "documents").count()
    assert(rows.length == docs)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      val byB = rs.groupBy(_._4).view.mapValues(_.length).toMap
      // rn·3 ≤ n ⟹ |head| = ⌊n/3⌋; rn·3 ≤ 2n ⟹ |head|+|middle| = ⌊2n/3⌋
      assert(byB.getOrElse("head", 0) == n / 3, s"$lang head")
      assert(byB.getOrElse("head", 0) + byB.getOrElse("middle", 0)
        == 2 * n / 3, s"$lang head+middle")
      // score ordering: every head score ≥ every middle ≥ every tail
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      for (h <- scores("head").minOption; m <- scores("middle").maxOption)
        assert(h >= m, s"$lang head<middle")
      for (m <- scores("middle").minOption; t <- scores("tail").maxOption)
        assert(m >= t, s"$lang middle<tail")
    }
  }

  test("x67: prefix filtering finds EXACTLY the brute-force pairs") {
    val got = runx("x67_prefix_filter_join")
      .select($"doc_a", $"doc_b", $"inter")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, i) => (a, b) -> i }.toMap
    // brute force: distinct trigram-shingle sets of the same corpus
    // construction (docs with < 3 tokens have no shingles and drop out)
    def shingles(t: Array[String]): Set[String] =
      t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val t = text.split("\\s+", -1)
        Seq(id -> shingles(t), (id + 10000L) -> shingles(t.dropRight(3)))
      }.filter(_._2.nonEmpty).toMap
    val ids = sets.keys.toArray.sorted
    val expected = scala.collection.mutable.Map[(Long, Long), Long]()
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val (sa, sb) = (sets(a), sets(b))
      if (math.min(sa.size, sb.size) * 5 >= math.max(sa.size, sb.size) * 3) {
        val inter = sa.intersect(sb).size
        if (inter * 5 >= (sa.size + sb.size - inter) * 3)
          expected((a, b)) = inter.toLong
      }
    }
    assert(expected.nonEmpty, "planted twins must yield pairs")
    assert(got == expected.toMap,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
  }

  test("x68: per-user quota is ceil(n/5) and no train event is after a test event") {
    val rows = runx("x68_temporal_split")
      .select($"event_id", $"user_id", $"ts", $"split")
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    assert(rows.length == Tables(spark, dir, "events").count())
    rows.groupBy(_._2).foreach { case (u, rs) =>
      val test_ = rs.filter(_._4 == "test")
      assert(test_.length == (rs.length + 4) / 5, s"user $u quota")
      val train = rs.filter(_._4 == "train")
      for (tmin <- test_.map(_._3.getTime).minOption;
           tmax <- train.map(_._3.getTime).maxOption)
        assert(tmin >= tmax, s"user $u train leaks past test boundary")
    }
  }

  test("x69: slope matches a driver-side exact recompute and is negative") {
    val (n, slope) = runx("x69_zipf_slope")
      .as[(Long, Double)].collect().head
    val freqs = Tables(spark, dir, "documents")
      .select($"text").as[String].collect()
      .flatMap(_.split("\\s+", -1)).groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(n == freqs.length)
    def q(v: Double) = math.round(BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val pts = freqs.zipWithIndex.map { case ((_, c), i) =>
      (q(math.log(i + 1.0)), q(math.log(c.toDouble))) }
    val (sx, sy) = (pts.map(_._1).map(BigInt(_)).sum, pts.map(_._2).map(BigInt(_)).sum)
    val sxy = pts.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val sxx = pts.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
    val nn = BigInt(pts.length)
    val exp = ((nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx).toDouble)
    assert(math.abs(slope - BigDecimal(exp)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(slope < 0, "corpus frequencies must fall with rank")
  }

  test("x70: integer PageRank equals a driver-side exact replay") {
    val got = runx("x70_graph_pagerank")
      .select($"node_type", $"key", $"deg", $"rank")
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, k, d, r) => (t, k) -> ((d, r)) }.toMap
    // replay the same integer iteration on the collected edge list
    val e0 = Tables(spark, dir, "lineitem")
      .select(($"l_partkey" * 2).as("s"), ($"l_suppkey" * 2 + 1).as("d"))
      .distinct().as[(Long, Long)].collect()
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s_, d_) => in(d_) += rank(s_) / deg(s_) }
      rank = in.map { case (n, m) => n -> (150000L + 850L * m / 1000L) }.toMap
    }
    assert(got.size == rank.size)
    rank.foreach { case (n, r) =>
      val key = (if (n % 2 == 0) "part" else "supplier", n / 2)
      assert(got(key) == ((deg(n), r)), s"node $n")
    }
  }

  test("x71: the verdict is exactly the conjunction of its four rules") {
    val rows = runx("x71_gopher_rules")
      .select($"doc_id", $"n_words", $"mwl100", $"stop_count",
        $"sym_ppm", $"pass")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.length == Tables(spark, dir, "documents").count())
    rows.foreach { case (id, nw, mwl, stop, sym, pass) =>
      val exp = nw >= 50 && nw <= 100000 && mwl >= 300 && mwl <= 1000 &&
        stop >= 2 && sym <= 100000
      assert(pass == exp, s"doc $id")
    }
    // spot-check the arithmetic on one raw doc
    val (id0, text) = Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].head()
    val r = rows.find(_._1 == id0).get
    val toks = text.split("\\s+", -1)
    assert(r._2 == toks.length)
    assert(r._3 == text.replaceAll("\\s", "").length * 100L / toks.length)
    assert(r._5 == text.replaceAll("[A-Za-z0-9 ]", "").length * 1000000L
      / text.length)
  }

  test("q38: only >250-qty orders, sorted by price, at most 100 rows") {
    val rows = runq("q38_large_orders")
      .select($"o_orderkey", $"o_totalprice", $"total_qty")
      .as[(Long, Double, Double)].collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    assert(rows.forall(_._3 > 250))
    val prices = rows.map(_._2)
    assert(prices.zip(prices.drop(1)).forall { case (a, b) => a >= b })
    // spot-check one row's qty against a direct aggregate
    val k = rows.head._1
    val direct = Tables(spark, dir, "lineitem")
      .filter($"l_orderkey" === k).agg(sum($"l_quantity")).as[Double].head()
    assert(math.abs(direct - rows.head._3) < 1e-6)
  }

  test("q39: shares sum to 1 per year and only the target region's nations appear") {
    val rows = runq("q39_market_share")
      .select($"o_year", $"n_name", $"revenue", $"share")
      .as[(Int, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    val regionNations = Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region")
        .filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_name").as[String].collect().toSet
    assert(rows.map(_._2).toSet.subsetOf(regionNations))
    rows.groupBy(_._1).foreach { case (y, rs) =>
      val total = rs.map(_._4).sum
      // shares are individually rounded to 4 decimals
      assert(math.abs(total - 1.0) <= rs.length * 5e-5 + 1e-9, s"year $y: $total")
      rs.foreach(r => assert(r._3 > 0))
    }
  }
}
