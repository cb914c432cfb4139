package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{BpeMerge, Text}

/** Round-11 wave: the BPE encode/apply path (x85) — the round-trip and
  * policy properties the DuckDB oracle can't state directly.
  */
class RoundElevenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables(spark, dir, "documents")
    .select(col("doc_id"), Text.tokens(col("text")).as("toks"))

  test("x85 round trip: encode(train corpus) == training's own rewrites") {
    val train = docs.filter(col("doc_id") % 10 === 0)
    val merges = BpeMerge.trainPairs(train, rounds = 3)
    val enc = BpeMerge.encode(train, merges)
      .select(col("doc_id"), col("toks").as("e"))
    val trained = BpeMerge.mergeRounds(train, rounds = 3)
      .select(col("doc_id"), col("toks").as("t"))
    val joined = enc.join(trained, "doc_id").cache()
    assert(joined.count() === train.count())
    assert(joined.filter(col("e") =!= col("t")).count() === 0,
      "applying the trained rules in training order must reproduce " +
        "the trained corpus row for row")
    joined.unpersist()
  }

  test("encode covers the full corpus, not just the training subset " +
      "(the retired-x85 form, spec-only since round 14; x124 is the " +
      "registered depth anchor)") {
    val merges = BpeMerge.trainPairs(
      docs.filter(col("doc_id") % 10 === 0), rounds = 3)
    val out = BpeMerge.encode(docs, merges)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens")).cache()
    assert(out.count() === docs.count())
    // encoding can only shorten (each merge fuses two tokens into one)
    val before = docs.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_before"))
    assert(out.join(before, "doc_id")
      .filter(col("n_tokens") > col("n_before")).count() === 0)
    out.unpersist()
  }

  test("encode with allowIdentical=true applies the left-greedy run rule " +
      "to documents training never saw") {
    val train = Seq((1L, "b a a a a a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    // adjacency counts: (a,a)=4 beats (b,a)=1 and (a,b)=1
    val merges = BpeMerge.trainPairs(train, rounds = 1,
      allowIdentical = true)
    val unseen = Seq((2L, "a a a"), (3L, "c a a a a c"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    val got = BpeMerge.encode(unseen, merges, allowIdentical = true)
      .select(col("doc_id"), col("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(2L) === Seq("a_a", "a"))
    assert(got(3L) === Seq("c", "a_a", "a_a", "c"))
  }

  // --- x86: deterministic shard write-out -----------------------------

  import graft.ext.Shards

  private def shardBase = docs.select(col("doc_id")).filter(col("doc_id") < 400)
  private def shardAppendBatch = docs.select(col("doc_id"))
    .filter(col("doc_id") >= 400)

  test("x86: assignment is deterministic and shards are dense fixed-size") {
    val a1 = Shards.assign(shardBase, col("doc_id"), 100, seed = 42)
      .select("doc_id", "shard", "position")
    val a2 = Shards.assign(shardBase, col("doc_id"), 100, seed = 42)
      .select("doc_id", "shard", "position")
    assert(a1.exceptAll(a2).count() === 0 && a2.exceptAll(a1).count() === 0)
    // every shard except the highest holds exactly 100 docs at dense
    // positions 0..99 (fixed-size shards, no gaps)
    val sizes = a1.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("position").as("lo"),
        max("position").as("hi"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    sizes.dropRight(1).foreach { case (s, n, lo, hi) =>
      assert(n === 100L && lo === 0L && hi === 99L, s"shard $s")
    }
    val (_, nLast, loLast, hiLast) = sizes.last
    assert(loLast === 0L && hiLast === nLast - 1)
  }

  test("x86: appends land in fresh shards; shipped assignments immutable") {
    val base = Shards.assign(shardBase, col("doc_id"), 100, seed = 42)
    val maxShard = base.agg(max("shard")).as[Long].head()
    val appended = Shards.assign(shardAppendBatch, col("doc_id"), 100,
      seed = 42, rankOffset = (maxShard + 1) * 100)
    // no shard collision: the new batch starts past every shipped shard
    assert(appended.agg(min("shard")).as[Long].head() === maxShard + 1)
    // write base, append the batch, re-read: base rows byte-identical
    val out = java.nio.file.Files
      .createTempDirectory("shards").toString
    Shards.write(base, out)
    Shards.write(appended, out, append = true)
    val reread = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"), col("position"))
    val baseRows = base.select(col("doc_id"), col("shard"), col("position"))
    assert(reread.count() === base.count() + appended.count())
    assert(baseRows.exceptAll(reread).count() === 0,
      "every shipped (doc, shard, position) must survive the append")
  }

  // --- r10 advice: Bloom.test under duplicate key rows ----------------

  test("Bloom.test: duplicate key rows cannot produce false negatives") {
    import graft.ext.Bloom
    val ref = Seq("alpha", "beta", "gamma").toDF("gram")
    val bits = Bloom.build(ref, col("gram"), j = 4)
    // 'alpha' appears twice — the count-based verdict saw sum = 2j for
    // the collapsed group and reported a member as absent
    val keys = Seq("alpha", "alpha", "beta", "zeta").toDF("gram")
    val verdicts = Bloom.test(keys, col("gram"), bits, j = 4)
      .as[(String, Boolean)].collect().toMap
    assert(verdicts("alpha"), "duplicated member must still test positive")
    assert(verdicts("beta"))
  }

  // --- x89: histogram quantile sketch ---------------------------------

  test("x89: rank-exact, value error < binWidth, at every quantile") {
    val out = ExtQueriesAccess.run(spark, dir, "x89_quantile_histogram")
      .select(col("q_ppm"), col("est"), col("exact"), col("err"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 5)
    out.foreach { case (q, est, exact, err) =>
      assert(est >= exact && err === est - exact && err >= 0 && err < 64,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("x89: shard histograms merge by addition into the whole") {
    import graft.ext.Quantiles
    val docs = Tables(spark, dir, "documents")
    val whole = Quantiles.histogram(docs, col("n_chars"), 64L)
    val a = Quantiles.histogram(
      docs.filter(col("doc_id") % 2 === 0), col("n_chars"), 64L)
    val b = Quantiles.histogram(
      docs.filter(col("doc_id") % 2 =!= 0), col("n_chars"), 64L)
    val merged = a.unionByName(b)
      .groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    assert(merged.exceptAll(whole).count() === 0 &&
      whole.exceptAll(merged).count() === 0,
      "sum of shard grids must equal the union grid cell for cell")
  }
}
