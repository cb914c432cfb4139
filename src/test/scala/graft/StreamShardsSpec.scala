package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamShards

/** Streaming shard write-out: micro-batches append as fresh immutable
  * shards (x86's contract made continuous), shipped assignments never
  * move, and a replayed batch id is a no-op (exactly-once content
  * under at-least-once delivery).
  */
class StreamShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batches land in fresh shards; shipped rows immutable; replay no-op") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("stream_shards").toString
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("doc_id")
      .writeStream
      .foreachBatch(StreamShards.sink("doc_id", out,
        docsPerShard = 10, seed = 7))
      .outputMode("append").start()
    try {
      input.addData(1L to 25L)
      q.processAllAvailable()
      val snap1 = spark.read.parquet(out)
        .select($"doc_id", $"shard".cast("long"), $"position")
        .as[(Long, Long, Long)].collect().toSet
      assert(snap1.size === 25)
      // 25 docs at 10/shard: shards 0,1 full, shard 2 holds 5
      assert(snap1.map(_._2) === Set(0L, 1L, 2L))

      input.addData(26L to 40L)
      q.processAllAvailable()
      val all = spark.read.parquet(out)
        .select($"doc_id", $"shard".cast("long"), $"position")
        .as[(Long, Long, Long)].collect().toSet
      assert(all.size === 40)
      // every shipped (doc, shard, position) from batch 1 survives
      assert(snap1.subsetOf(all))
      // the new batch starts past every shipped shard
      assert((all -- snap1).map(_._2).min === 3L)

      // replaying an already-written batch id is a no-op
      val replayed = StreamShards.appendBatch(
        Seq(99L, 98L).toDF("doc_id"), batchId = 0L,
        "doc_id", out, docsPerShard = 10, seed = 7)
      assert(replayed === 0L)
      assert(spark.read.parquet(out).count() === 40)
    } finally q.stop()
  }
}
