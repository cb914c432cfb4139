package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Text
import graft.streaming.StreamWinnow

/** Streaming winnowing near-dup gate over a frozen fingerprint index:
  * stream verdicts must equal the batch verdicts of the same docs
  * regardless of micro-batch boundaries (fingerprinting is per-doc,
  * the index is frozen), insertion-shifted copies of indexed docs must
  * flag, fresh text must pass, and replaying a batch must not change
  * any verdict.
  */
class StreamWinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def toks(df: DataFrame): DataFrame =
    df.withColumn("t", Text.tokens(col("text")))

  test("stream == batch verdicts; shifted copies flag; fresh text passes") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val index = StreamWinnow.indexHashes(toks(docs), "t", 4, 5)
      .collect().map(_.getLong(0)).toSeq.toDF("fp_h")

    // arrivals: insertion-shifted copies of indexed docs (must flag)
    // and fresh unrelated text (must pass)
    val copies = docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 50000).as("doc_id"),
        concat(lit("new intro words "), col("text")).as("text"))
    val fresh = spark.range(40).select(
      (col("id") + 90000).as("doc_id"),
      concat_ws(" ", (0 to 12).map(i =>
        concat(lit(s"zq${i}x"), col("id"))): _*).as("text"))
    val arrivals = copies.unionByName(fresh)
      .as[(Long, String)].collect().toSeq

    def flagged(df: DataFrame): DataFrame =
      StreamWinnow.flag(toks(df), "t", 4, 5, index)

    val (b1, b2) = arrivals.splitAt(arrivals.length / 2)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Boolean)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= flagged(batch)
          .as[(Long, Long, Long, Long, Boolean)](
            implicitly[org.apache.spark.sql.Encoder[
              (Long, Long, Long, Long, Boolean)]])
          .collect()
        (): Unit
      }
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val streamed = got.sortBy(_._1).toSeq
    val batch = flagged(arrivals.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)

    val (cp, fr) = streamed.partition(_._1 < 90000)
    assert(cp.length === 40 && fr.length === 40)
    // every shifted copy shares a majority of fingerprints (MOSS
    // guarantee: the full original text is an indexed substring)
    assert(cp.forall(_._5), s"unflagged copies: ${cp.filterNot(_._5)}")
    // fresh docs: unique zq-tokens can't collide with indexed grams
    assert(fr.forall(r => !r._5 && r._3 === 0L))
    // a replay of the same rows yields identical verdicts
    val replay = flagged(b1.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(replay === streamed.filter(r => b1.exists(_._1 == r._1)))
  }

  test("short docs pass with n_fp=0 rather than dropping") {
    val index = Seq(1L, 2L).toDF("fp_h")
    val tiny = Seq((7L, "too short to fingerprint")).toDF("doc_id", "text")
    val r = StreamWinnow.flag(toks(tiny), "t", 4, 5, index)
      .as[(Long, Long, Long, Long, Boolean)].head()
    assert(r === ((7L, 0L, 0L, 0L, false)))
  }
}
