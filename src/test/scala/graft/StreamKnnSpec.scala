package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{AnnIndex, KMeansLite, Similarity}
import graft.streaming.StreamKnn

/** Streaming incremental kNN maintenance (the production form of x75):
  * micro-batches refresh exactly the touched-cell edge partitions of
  * an on-disk index. The invariant replayed here: after each batch,
  * every cell that batch touched holds the frozen-index full-recompute
  * edges over everything ingested so far, and cells it did NOT touch
  * still hold their previous edges byte-for-byte.
  */
class StreamKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def corpus: DataFrame = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("v"))

  test("micro-batches refresh touched cells; untouched cells keep edges") {
    val tmp = java.nio.file.Files.createTempDirectory("streamknn").toString
    val statePath = s"$tmp/assignments"
    val edgesPath = s"$tmp/edges"
    val topK = 5

    // offline bootstrap: seed corpus (vec_id >= 100), frozen centroids
    val seed = corpus.filter($"vec_id" >= 100)
    val cents = KMeansLite.fitQuantized(seed, "vec_id", "v", 16, iters = 1)
    val seedAssigned = StreamKnn.withCell(seed, cents)
    seedAssigned.write.mode("overwrite").parquet(statePath)
    AnnIndex.knnGraphAssigned(seedAssigned, topK)
      .join(seedAssigned.select($"vec_id".as("src_id"), $"cell"), "src_id")
      .write.partitionBy("cell").mode("overwrite").parquet(edgesPath)

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Double])]
    val q = StreamKnn.maintain(
      input.toDF().toDF("vec_id", "v"), cents, statePath, edgesPath,
      topK, checkpoint = s"$tmp/ckpt")
    try {
      val b1 = corpus.filter($"vec_id" < 50)
      val b2 = corpus.filter($"vec_id" >= 50 && $"vec_id" < 100)
      def rowsOf(df: DataFrame) =
        df.as[(Long, Array[Double])].collect().toSeq

      input.addData(rowsOf(b1): _*)
      q.processAllAvailable()
      val cellsB1 = StreamKnn.withCell(b1, cents)
        .select($"cell").distinct().as[Int].collect().toSet
      val afterB1 = spark.read.parquet(edgesPath)
        .select($"src_id", $"rnk", $"neighbor_id", $"d2_e6", $"cell")
        .as[(Long, Long, Long, Long, Int)].collect().toSet

      input.addData(rowsOf(b2): _*)
      q.processAllAvailable()
      val cellsB2 = StreamKnn.withCell(b2, cents)
        .select($"cell").distinct().as[Int].collect().toSet
      val afterB2 = spark.read.parquet(edgesPath)
        .select($"src_id", $"rnk", $"neighbor_id", $"d2_e6", $"cell")
        .as[(Long, Long, Long, Long, Int)].collect().toSet

      // reference: frozen-index full recompute over everything ingested
      val all = StreamKnn.withCell(corpus, cents)
      val fullNow = AnnIndex.knnGraphAssigned(all, topK)
        .join(all.select($"vec_id".as("src_id"), $"cell"), "src_id")
        .select($"src_id", $"rnk", $"neighbor_id", $"d2_e6", $"cell")
        .as[(Long, Long, Long, Long, Int)].collect().toSet

      // cells touched by batch 2 hold the up-to-date recompute
      assert(afterB2.filter(r => cellsB2(r._5)) ==
        fullNow.filter(r => cellsB2(r._5)))
      // cells batch 2 did NOT touch are byte-identical to their state
      // after batch 1 (stale by exactly the batches that skipped them)
      assert(afterB2.filter(r => !cellsB2(r._5)) ==
        afterB1.filter(r => !cellsB2(r._5)))
      // and every seed+b1 node in a b1-touched cell was refreshed then
      val stateB1 = StreamKnn.withCell(seed.unionByName(b1), cents)
      val fullB1 = AnnIndex.knnGraphAssigned(stateB1, topK)
        .join(stateB1.select($"vec_id".as("src_id"), $"cell"), "src_id")
        .select($"src_id", $"rnk", $"neighbor_id", $"d2_e6", $"cell")
        .as[(Long, Long, Long, Long, Int)].collect().toSet
      assert(afterB1.filter(r => cellsB1(r._5)) ==
        fullB1.filter(r => cellsB1(r._5)))
    } finally q.stop()
  }
}
