package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Text
import graft.streaming.StreamBloom

/** Streaming Bloom decontamination: the stream-side probe of a static
  * reference filter must agree with the batch probe of the same bytes
  * row-for-row, and reference members can never be missed (no false
  * negatives — the property a Bloom gate is allowed to rely on).
  */
class StreamBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val grams = Tables(spark, dir, "documents")
    .withColumn("tk", Text.tokens(col("text")))
    .filter(size(col("tk")) >= 5)
    .select(col("doc_id"), explode(Text.wordShingles(col("tk"), 5)).as("gram"))

  test("stream flags == batch flags on the same filter; no false negatives") {
    val ref = grams.filter(col("doc_id") % 10 === 0)
      .select("gram").distinct()
    val bytes = StreamBloom.filterBytes(ref, col("gram"),
      expectedItems = 20000L, fpp = 0.01)

    // reference members always hit (no false negatives)
    val refFlags = StreamBloom.flag(ref, col("gram"), bytes)
    assert(refFlags.filter(!col("bloom_hit")).count() === 0)

    // stream two micro-batches; verdicts must equal the batch probe
    val sample = grams.filter(col("doc_id") % 7 === 0)
      .select("doc_id", "gram").as[(Long, String)].collect().toSeq
    val (b1, b2) = sample.splitAt(sample.length / 2)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamBloom.flag(
      input.toDF().toDF("doc_id", "gram"), col("gram"), bytes)
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("bloom_out")
        .as[(Long, String, Boolean)].collect().toSet
      val batch = StreamBloom.flag(
        sample.toDF("doc_id", "gram"), col("gram"), bytes)
        .as[(Long, String, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
