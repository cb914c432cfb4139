package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{NaiveBayes, Text}
import graft.streaming.StreamNb

/** The frozen narrow-map Naive Bayes scorer must agree with the batch
  * explode-join scorer row-for-row on real data, and the streaming
  * form must agree with the batch form across micro-batch boundaries
  * (stateless narrow map — the StreamBloom composability class).
  */
class StreamNbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, dir, "documents")
    .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
    .withColumn("t", Text.tokens(col("text")))
    .select(col("doc_id"), col("label"), col("t"))

  private lazy val frozen = {
    val (model, consts) =
      NaiveBayes.train(docs.filter(col("doc_id") % 3 === 0), "t", "label")
    StreamNb.freeze(model, consts)
  }

  test("frozen narrow fold == batch explode-join scorer, row for row") {
    val holdout = docs.filter(col("doc_id") % 3 =!= 0)
    val (model, consts) =
      NaiveBayes.train(docs.filter(col("doc_id") % 3 === 0), "t", "label")
    val batch = NaiveBayes.score(holdout, Seq("doc_id"), "t", model, consts)
      .select(col("doc_id"), col("n_toks"), col("score_e6"), col("pred"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val narrow = StreamNb.score(holdout, col("t"), frozen)
      .filter(col("n_toks") > 0) // batch explode drops token-less docs
      .select(col("doc_id"), col("n_toks"), col("score_e6"), col("pred"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(narrow === batch)
    assert(batch.nonEmpty)
    // frozen driver state is vocabulary-bounded, never corpus-sized
    assert(frozen.llr.size.toLong ===
      docs.filter(col("doc_id") % 3 === 0)
        .select(explode(col("t"))).distinct().count())
  }

  test("stream across micro-batches == batch narrow scoring") {
    val sample = docs.select(col("doc_id"), concat_ws(" ", col("t")))
      .as[(Long, String)].collect().toSeq
    val expected = StreamNb.score(docs, col("t"), frozen)
      .select(col("doc_id"), col("score_e6"), col("pred"))
      .as[(Long, Long, Boolean)].collect().toSet
    val (b1, b2) = sample.splitAt(sample.length / 2)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamNb.score(
      input.toDF().toDF("doc_id", "text")
        .withColumn("t", Text.tokens(col("text"))),
      col("t"), frozen)
      .select(col("doc_id"), col("score_e6"), col("pred"))
      .writeStream.format("memory").queryName("nb_out")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("nb_out")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(streamed === expected)
    } finally q.stop()
  }
}
