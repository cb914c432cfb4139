package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dsir, Text}
import graft.queries.ExtQueries
import graft.streaming.{StreamDsir, StreamNb}

/** Streaming DSIR gate on a frozen λ table: the narrow-map fold must
  * reproduce the batch explode-join weights exactly, agree across
  * micro-batch boundaries, and compose with the other narrow serving
  * gates in one pass.
  */
class StreamDsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables(spark, dir, "documents")
    .withColumn("t", Text.tokens(col("text")))

  private lazy val lamE6: Seq[Long] = {
    val feats = docs.filter(size(col("t")) >= 2)
      .select(col("lang"), explode(Dsir.featureArray(col("t"))).as("f"))
      .withColumn("b", Dsir.bucket(col("f")))
    StreamDsir.freeze(Dsir.lambdaTable(feats, col("lang") === "en"))
  }

  test("narrow fold == batch explode-join weights, row for row") {
    assert(lamE6.length === Dsir.Buckets)
    val viaFold = StreamDsir.weight(docs, col("t"), lamE6, 0L)
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("n_feats"), col("w_e6"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // the x112 construction of the same weights (explode + join)
    val lamDf = lamE6.zipWithIndex
      .map { case (l, b) => (b.toLong, l) }.toDF("b", "lam_e6")
    val viaJoin = docs.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(Dsir.featureArray(col("t"))).as("f"))
      .withColumn("b", Dsir.bucket(col("f")))
      .join(broadcast(lamDf), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lam_e6")).as("w_e6"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaFold === viaJoin)
    // and it matches the registered x112 weights for the same docs
    val x112 = ExtQueries.queries("x112_dsir")(spark, dir)
      .select(col("doc_id"), col("w_e6"))
      .as[(Long, Long)].collect().toMap
    val fold = viaFold.map(r => r._1 -> r._3).toMap
    x112.foreach { case (id, w) => assert(fold(id) === w) }
  }

  test("stream == batch across micro-batch boundaries; threshold gates") {
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val tau = 0L
    val q = StreamDsir.weight(
      input.toDF().toDF("doc_id", "text")
        .withColumn("t", Text.tokens(col("text"))),
      col("t"), lamE6, tau)
      .select(col("doc_id"), col("n_feats"), col("w_e6"), col("keep"))
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.table("dsir_out")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val batch = StreamDsir.weight(docs, col("t"), lamE6, tau)
        .select(col("doc_id"), col("n_feats"), col("w_e6"), col("keep"))
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
      assert(streamed.forall(r => r._4 === (r._3 >= tau)))
      // the gate binds in both directions on this corpus
      assert(streamed.exists(_._4) && streamed.exists(!_._4))
    } finally q.stop()
  }

  test("composes with the NB quality gate as two narrow maps") {
    val train = docs
      .withColumn("label", when(col("lang") === "en", 1L).otherwise(0L))
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("label"), col("t"))
    val (model, consts) = graft.ext.NaiveBayes.train(train, "t", "label")
    val frozenNb = StreamNb.freeze(model, consts)
    val chained = StreamDsir.weight(
      StreamNb.score(docs, col("t"), frozenNb),
      col("t"), lamE6, 0L)
    // one pass, both verdicts present, no shuffle in the plan
    val plan = chained.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    val r = chained.select(col("doc_id"), col("score_e6"), col("w_e6"))
      .limit(5).collect()
    assert(r.length === 5)
  }
}
