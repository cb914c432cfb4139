package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join: identical result to the plain join under heavy skew") {
    // 20k fact rows, 90% on one hot key — the one-straggler shape
    val fact = spark.range(20000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100).as("k"),
      col("id").as("v"))
    val dim = spark.range(100).select(col("id").as("dk"),
      concat(lit("d"), col("id")).as("label"))

    val plain = fact.join(dim, col("k") === col("dk"))
      .agg(count(lit(1)), sum(col("v")), countDistinct(col("label")))
      .as[(Long, Long, Long)].head()
    val salted = SkewJoin.salted(fact, dim, "k", "dk", salts = 8)
      .agg(count(lit(1)), sum(col("v")), countDistinct(col("label")))
      .as[(Long, Long, Long)].head()
    assert(salted == plain)
  }

  test("salting scatters the hot key across sub-keys") {
    val fact = spark.range(8000).select(lit(1L).as("k"), col("id").as("v"))
    val perSalt = fact.withColumn("_s",
      pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .groupBy(col("_s")).count()
      .as[(Int, Long)].collect().toMap
    assert(perSalt.size == 8) // every sub-key in play
    assert(perSalt.values.max < 8000 * 2 / 8) // no sub-key re-concentrates
  }

  test("frameSample slices n fixed-width frames from the payload") {
    import graft.ext.MultiModal
    val df = Seq("abcdefghijklmnopqrstuvwxyz0123456789").toDF("text")
      .select(MultiModal.frameSample(col("text").cast("binary"), 4, 4).as("frames"))
    val frames = df.head().getSeq[Array[Byte]](0).map(new String(_, "UTF-8"))
    assert(frames.length == 4)
    assert(frames.head == "abcd") // frame 0 starts at byte 1
    assert(frames.forall(_.length == 4))
  }
}
