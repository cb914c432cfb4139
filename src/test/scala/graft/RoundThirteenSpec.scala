package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Shards
import graft.streaming.{StreamBloom, StreamGate}

/** Round-13 pins:
  *  - q02b: the bucketed deployment twin of q02 (round-12 verdict task
  *    1) — layout-invariant results and the zero-exchange join plan the
  *    layout exists to buy.
  *  - StreamGate checkpoint RESTART (round-12 verdict task 4): kill the
  *    composed gate between batches, leave mid-write garbage behind,
  *    restart from the checkpoint directory — final shard content must
  *    equal the uninterrupted run byte-for-byte, including the
  *    stateful dedup stage's recovered cross-batch state.
  */
class RoundThirteenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("q02b: bucketed layout leaves only the final aggregate shuffle") {
    val df = SparkEntry.queries("q02b_revenue_bucketed")(spark, dir)
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    val shuffles = df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    // lineitem ⋈ orders is co-located (bucketBy 8 on the orderkey,
    // sortBy for the merge); the dims are broadcast; the ONE legitimate
    // exchange is the 125-group final aggregate on (r_name, n_name)
    assert(shuffles.size <= 1,
      s"expected at most the aggregate exchange, found ${shuffles.size}")
    assert(df.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
  }

  test("q02b results are layout-invariant (equal to q02 row-for-row)") {
    val a = SparkEntry.queries("q02_revenue_by_nation")(spark, dir).collect()
    val b = SparkEntry.queries("q02b_revenue_bucketed")(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("StreamGate: restart from checkpoint == uninterrupted run, byte-for-byte") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // dups planted ACROSS the kill boundary (3/103 share text): the
    // restarted query must recover the dedup state store from the
    // checkpoint, or 103 leaks into the restarted run's output
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over the dog", 100L),
      (2L, "contaminated eval document one", 110L),
      (3L, "a duplicated text body arriving first", 120L))
    val batch2 = Seq(
      (103L, "a duplicated text body arriving first", 200L),
      (104L, "a fresh late document with new content", 210L),
      (105L, "another fresh document closing the run", 215L))
    val bytes = StreamBloom.filterBytes(
      Seq("contaminated eval document one").toDF("text"),
      md5(col("text")), 100L, 0.001)
    val rules = Seq("the" -> "quick", "a" -> "duplicated")

    def mkDocs(input: MemoryStream[(Long, String, Long)]) =
      input.toDF().toDF("doc_id", "text", "secs")
        .withColumn("ts", col("secs").cast("timestamp")).drop("secs")
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    // reference: ONE query, never killed, same batch boundaries
    val (outRef, ckRef) = (tmp("gate_ref_out"), tmp("gate_ref_ck"))
    val inRef = MemoryStream[(Long, String, Long)]
    val qRef = StreamGate.start(mkDocs(inRef), "text", "ts", "1 hour",
      bytes, rules, "doc_id", outRef, docsPerShard = 2, seed = 5,
      checkpoint = Some(ckRef))
    try {
      inRef.addData(batch1); qRef.processAllAvailable()
      inRef.addData(batch2); qRef.processAllAvailable()
    } finally qRef.stop()

    // interrupted: batch 0 commits, the query dies; a mid-write
    // batch-1 attempt left data WITHOUT a manifest (the real crash
    // residue); a NEW query restarts from the same checkpoint dir
    val (outA, ckA) = (tmp("gate_kill_out"), tmp("gate_kill_ck"))
    val inA = MemoryStream[(Long, String, Long)]
    val q1 = StreamGate.start(mkDocs(inA), "text", "ts", "1 hour",
      bytes, rules, "doc_id", outA, docsPerShard = 2, seed = 5,
      checkpoint = Some(ckA))
    try { inA.addData(batch1); q1.processAllAvailable() }
    finally q1.stop()
    // crash residue: partial batch-1 shards on disk, no manifest
    Shards.write(Shards.assign(
      Seq((999L, 1L, "junk")).toDF("doc_id", "n_tokens", "tokens_md5")
        .withColumn("_batch_id", lit(1L)),
      col("doc_id"), 2, 5, rankOffset = 4L), outA, append = true)
    inA.addData(batch2)
    val q2 = StreamGate.start(mkDocs(inA), "text", "ts", "1 hour",
      bytes, rules, "doc_id", outA, docsPerShard = 2, seed = 5,
      checkpoint = Some(ckA))
    try q2.processAllAvailable() finally q2.stop()

    def snap(out: String) = spark.read.parquet(out)
      .select($"doc_id", $"n_tokens", $"tokens_md5",
        $"shard".cast("long"), $"position", $"_batch_id")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    val ref = snap(outRef)
    assert(snap(outA) === ref)
    // the junk row is gone, the cross-kill dup 103 never landed, and
    // batch 1's rows carry the restarted query's recovered batch id
    assert(!ref.exists(_._1 == 999L) && !ref.exists(_._1 == 103L))
    assert(ref.map(_._1) === Set(1L, 3L, 104L, 105L))
    assert(ref.filter(_._6 == 1L).map(_._1) === Set(104L, 105L))
  }
}
