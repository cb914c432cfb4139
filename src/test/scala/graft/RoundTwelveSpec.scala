package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{BpeMerge, Shards}
import graft.streaming.StreamShards

/** Round-12 hardening pins:
  *  - Shards prefix-length invariance: the 2-level bucketed rank
  *    slices ONE total order, so 16^k bucket fan-outs at k = 1/2/3
  *    produce bit-identical (shard, position) assignments — the claim
  *    Shards.scala made for 100 TB fan-out, previously untested.
  *  - StreamShards manifest commit: a batch is committed only by its
  *    post-data manifest; a PARTIAL batch (data on disk, no manifest —
  *    a crash mid-write) is cleaned and rewritten on retry instead of
  *    being mistaken for a committed one (round-12 advice, medium).
  *  - BpeMerge empty-rule safety: a 0-row pair frame passes every
  *    document through unchanged rather than emptying the corpus
  *    (round-12 advice).
  */
class RoundTwelveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Shards.assign is prefixLen-invariant (k=1,2,3 bit-identical)") {
    val docs = (1L to 977L).toDF("doc_id")
    def m(k: Int) = Shards.assign(docs, col("doc_id"),
        docsPerShard = 37, seed = 11, prefixLen = k)
      .select($"doc_id", $"skey", $"shard", $"position")
      .as[(Long, String, Long, Long)].collect().toSet
    val k2 = m(2)
    assert(k2.size === 977)
    assert(m(1) === k2)
    assert(m(3) === k2)
    // dense fixed-size shards under every k
    assert(k2.map(_._3).max === 977 / 37)
  }

  test("StreamShards: partial batch (no manifest) is cleaned and rewritten") {
    val out = java.nio.file.Files
      .createTempDirectory("shards_manifest").toString
    // batch 0 commits normally
    val n0 = StreamShards.appendBatch(
      (1L to 25L).toDF("doc_id"), 0L, "doc_id", out,
      docsPerShard = 10, seed = 7)
    assert(n0 === 25L)
    assert(StreamShards.committedMaxShard(out) === 2L)
    val committed = spark.read.parquet(out)
      .select($"doc_id", $"shard".cast("long"), $"position")
      .as[(Long, Long, Long)].collect().toSet

    // simulate a crash mid-batch-1: data landed, manifest did NOT —
    // write batch-1 shards directly through Shards, bypassing the
    // manifest protocol (this is what a died foreachBatch leaves)
    val partial = Shards.assign(
      (26L to 31L).toDF("doc_id").withColumn("_batch_id", lit(1L)),
      col("doc_id"), 10, 7, rankOffset = 30L)
    Shards.write(partial, out, append = true)
    assert(spark.read.parquet(out).count() === 31)

    // retry of batch 1 with DIFFERENT (full) content: the partial
    // shard dirs are garbage-collected, the full batch lands fresh
    val n1 = StreamShards.appendBatch(
      (26L to 40L).toDF("doc_id"), 1L, "doc_id", out,
      docsPerShard = 10, seed = 7)
    assert(n1 === 15L)
    val all = spark.read.parquet(out)
      .select($"doc_id", $"shard".cast("long"), $"position")
      .as[(Long, Long, Long)].collect().toSet
    assert(all.size === 40)               // no partial leftovers
    assert(committed.subsetOf(all))       // shipped rows immutable
    assert((all -- committed).map(_._2).min === 3L) // fresh shards only

    // replay of the now-committed batch 1 is a no-op
    val n1r = StreamShards.appendBatch(
      (26L to 40L).toDF("doc_id"), 1L, "doc_id", out,
      docsPerShard = 10, seed = 7)
    assert(n1r === 0L)
    assert(spark.read.parquet(out).count() === 40)
  }

  test("native BpeEncodeRules == encodeFrozen bit for bit") {
    import graft.ext.Text
    // real corpus, trained rules — both merge policies
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .localCheckpoint()
    for (allowIdentical <- Seq(false, true)) {
      val rules = BpeMerge.collectRules(
        BpeMerge.trainPairs(docs, rounds = 3, allowIdentical))
      val frozen = BpeMerge.encodeFrozen(docs, rules, allowIdentical)
        .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
      val native = BpeMerge.encodeNative(docs, rules)
        .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
      assert(native === frozen, s"allowIdentical=$allowIdentical")
    }
    // deeper one-pass rule table (the serve-form vocabulary)
    val deep = BpeMerge.topPairs(docs, 25).orderBy($"r").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val fDeep = BpeMerge.encodeFrozen(docs, deep)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    val nDeep = BpeMerge.encodeNative(docs, deep)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    assert(nDeep === fDeep)
    // identical-halves left-greedy run rule, hand-computed
    val runs = Seq((1L, Seq("a", "a", "a", "a", "a")),
      (2L, Seq("x", "a", "a", "x", "a"))).toDF("doc_id", "toks")
    val got = BpeMerge.encodeNative(runs, Seq("a" -> "a"))
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    assert(got === Map(1L -> Seq("a_a", "a_a", "a"),
      2L -> Seq("x", "a_a", "x", "a")))
    // empty rule list is the identity
    val idd = BpeMerge.encodeNative(runs, Nil)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    assert(idd === Map(1L -> Seq("a", "a", "a", "a", "a"),
      2L -> Seq("x", "a", "a", "x", "a")))
  }

  test("BpeMerge.applyPair with an empty rule frame is the identity") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "b")),
      (2L, Seq("x"))).toDF("doc_id", "toks")
    val emptyPair = Seq.empty[(String, String)].toDF("ma", "mb")
    def got(allowIdentical: Boolean) =
      BpeMerge.applyPair(docs, emptyPair, allowIdentical)
        .select($"doc_id", $"toks").as[(Long, Seq[String])]
        .collect().toMap
    val want = Map(1L -> Seq("a", "b", "a", "b"), 2L -> Seq("x"))
    assert(got(allowIdentical = false) === want)
    assert(got(allowIdentical = true) === want)
    // and a corpus with no adjacent pairs at all trains a 0-row rule
    // that encode() survives end to end
    val singles = Seq((1L, Seq("x")), (2L, Seq("y"))).toDF("doc_id", "toks")
    val rules = BpeMerge.trainPairs(singles, rounds = 1)
    val enc = BpeMerge.encode(singles, rules)
      .select($"doc_id", $"toks").as[(Long, Seq[String])].collect().toMap
    assert(enc === Map(1L -> Seq("x"), 2L -> Seq("y")))
  }

  test("trainFast rule sequence == recount trainPairs (both policies)") {
    import graft.ext.Text
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .localCheckpoint()
    for (allowIdentical <- Seq(false, true)) {
      val slow = BpeMerge.collectRules(
        BpeMerge.trainPairs(docs, rounds = 8, allowIdentical))
      val fast = BpeMerge.collectRules(
        BpeMerge.trainFast(BpeMerge.typeTable(docs.select($"toks")),
          rounds = 8, allowIdentical))
      assert(fast === slow, s"allowIdentical=$allowIdentical")
    }
  }

  test("trainFast: counts invariant, tie order, weights, exhaustion") {
    // maintained counts == a fresh recount of the maintained types,
    // after enough rounds for several delta folds
    val corpus = Seq(
      Seq("a", "b", "c", "a", "b"), Seq("b", "c", "a", "b", "c"),
      Seq("a", "a", "a", "b"), Seq("c", "c", "b", "a", "b", "c"),
      Seq("a", "b"), Seq("a", "b"), Seq("b", "c", "b", "c"))
      .toDF("toks")
    for (allowIdentical <- Seq(false, true)) {
      val (_, types, counts) = BpeMerge.trainFastState(
        BpeMerge.typeTable(corpus), rounds = 5, allowIdentical)
      val maintained = counts.as[(String, Long)].collect().toMap
      val recounted = BpeMerge.pairCounts(types, allowIdentical)
        .as[(String, Long)].collect().toMap
      assert(maintained === recounted, s"allowIdentical=$allowIdentical")
    }

    // count ties break to the packed-string minimum in BOTH trainers:
    // (a,b) and (b,a) each occur twice; "ab" < "ba"
    val tied = Seq(Seq("a", "b"), Seq("a", "b"),
      Seq("b", "a"), Seq("b", "a")).toDF("toks")
    val tiedDocs = tied.withColumn("doc_id", monotonically_increasing_id())
    val slowTied = BpeMerge.collectRules(
      BpeMerge.trainPairs(tiedDocs, rounds = 1))
    val fastTied = BpeMerge.collectRules(
      BpeMerge.trainFast(BpeMerge.typeTable(tied), rounds = 1))
    assert(slowTied === Seq(("a", "b")))
    assert(fastTied === slowTied)

    // the type table carries multiplicities, not copies
    val tt = BpeMerge.typeTable(
      Seq(Seq("x", "y"), Seq("x", "y"), Seq("x", "y"), Seq("y", "x"))
        .toDF("toks")).as[(Seq[String], Long)].collect().toMap
    assert(tt === Map(Seq("x", "y") -> 3L, Seq("y", "x") -> 1L))

    // an exhausting corpus: rules past the available merges are 0-row
    // in both trainers and encode() under them is still the identity
    val tiny = Seq(Seq("p", "q")).toDF("toks")
    val tinyDocs = tiny.withColumn("doc_id", lit(1L))
    val fastRules = BpeMerge.trainFast(
      BpeMerge.typeTable(tiny), rounds = 3)
    val slowRules = BpeMerge.trainPairs(tinyDocs, rounds = 3)
    assert(fastRules.map(_.count()) === slowRules.map(_.count()))
    val enc2 = BpeMerge.encode(tinyDocs, fastRules)
      .select($"toks").as[Seq[String]].collect().toSeq
    assert(enc2 === Seq(Seq("p_q")))
  }

  test("native ArrayIntersectSize == size(array_intersect) bit for bit") {
    import graft.ext.{Dedup, Text}
    // real shingle arrays, every cross pair of 60 docs
    val sh = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 60)
      .withColumn("t", Text.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      .localCheckpoint()
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        Dedup.intersectSize(col("a.s"), col("b.s")).as("native"),
        size(array_intersect(col("a.s"), col("b.s"))).cast("long")
          .as("builtin"))
    assert(pairs.filter(col("native") =!= col("builtin")).count() === 0)
    assert(pairs.count() > 1000)

    // edge fixtures: duplicates in either side count once; a null
    // element present in BOTH sides counts once; empty and disjoint
    val f = Seq(
      (Seq("a", "b", "b", "c"), Seq("b", "b", "a", "z")),
      (Seq[String]("a", null, "c"), Seq[String](null, "c", null)),
      (Seq[String](null, "x"), Seq("y", "z")),
      (Seq.empty[String], Seq("a")),
      (Seq("a", "a"), Seq("a", "a", "a")),
      (Seq("p", "q"), Seq("r", "s"))).toDF("x", "y")
    val got = f.select(
        Dedup.intersectSize($"x", $"y").as("native"),
        size(array_intersect($"x", $"y")).cast("long").as("builtin"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, b) => assert(n === b) }
    // null ARRAY input -> null, matching size(array_intersect) under
    // the non-legacy sizeOfNull default
    val nn = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("x", "y")
      .select(Dedup.intersectSize($"x", $"y").as("n"),
        size(array_intersect($"x", $"y")).cast("long").as("b"))
      .collect()(0)
    assert(nn.isNullAt(0) && nn.isNullAt(1))
  }

  test("x97 hybrid RRF: exact-integer fusion invariants") {
    val out = graft.queries.ExtQueries
      .queries("x97_hybrid_rrf")(spark, "/root/testdata/sf0.001")
      .collect()
    // 8 queries × top-10, every query fully served
    assert(out.length === 80)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 8 && byQ.values.forall(_.length === 10))
    out.foreach { r =>
      val (rrf, rs, rd) = (r.getLong(3), r.getLong(4), r.getLong(5))
      // the emitted rrf is exactly the integer-division formula over
      // the emitted leg ranks (0 = absent from that leg's top-50)
      val expect = (if (rs > 0) 1000000000L / (60 + rs) else 0L) +
        (if (rd > 0) 1000000000L / (60 + rd) else 0L)
      assert(rrf === expect, s"row $r")
      assert(rs >= 0 && rs <= 50 && rd >= 0 && rd <= 50)
      assert(rs > 0 || rd > 0)
    }
    // per query: rnk follows (rrf desc, doc_id asc); the query doc
    // itself is its own dense rank 1 (cosine 1.0) and fuses into the
    // top-10. NOT asserted: self tops the SPARSE leg — BM25 length
    // normalization can rank a shorter doc above the query doc for
    // the query's own terms, which is correct behavior.
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 10L))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(3) > b.getLong(3) ||
          (a.getLong(3) == b.getLong(3) && a.getLong(2) < b.getLong(2)))
      }
      val self = sorted.filter(_.getLong(2) == q)
      assert(self.length === 1, s"query $q: self doc not in top-10")
      assert(self.head.getLong(5) === 1L,
        s"query $q: self doc not dense rank 1")
    }
  }
}
