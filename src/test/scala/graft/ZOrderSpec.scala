package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("interleave8 is a bijection [0,255]² → [0,65535]") {
    val n = spark.range(0, 65536).select(
      (col("id") / 256).cast("long").as("x"),
      pmod(col("id"), lit(256L)).as("y"))
    val z = n.select(ZOrder.interleave8($"x", $"y").as("z"))
    assert(z.agg(countDistinct($"z"), min($"z"), max($"z"))
      .as[(Long, Long, Long)].head() === ((65536L, 0L, 65535L)))
  }

  test("interleave8 places known bit patterns") {
    val got = Seq((255L, 0L), (0L, 255L), (255L, 255L), (1L, 1L))
      .toDF("x", "y")
      .select(ZOrder.interleave8($"x", $"y").as("z"))
      .as[Long].collect().toSeq
    // x bits land at odd positions, y bits at even positions
    assert(got === Seq(0xAAAAL, 0x5555L, 0xFFFFL, 3L))
  }

  test("normalize255 maps bounds to 0 and 255, constant column to 0") {
    val df = Seq(10L, 110L, 210L).toDF("v")
      .withColumn("n", ZOrder.normalize255($"v", lit(10L), lit(210L)))
    assert(df.select($"n").as[Long].collect().toSeq === Seq(0L, 127L, 255L))
    val const = Seq(5L).toDF("v")
      .select(ZOrder.normalize255($"v", lit(5L), lit(5L)).as("n"))
    assert(const.as[Long].head() === 0L)
  }

  test("z-sorted buckets prune a second-dimension slab; x-sorted cannot") {
    // uniform 64×64 grid of points; probe = a slab covering all of x
    // and 1/4 of y. The x-sorted layout's every bucket spans the full
    // y range; the z-sorted layout confines the slab.
    val pts = spark.range(0, 4096).select(
      col("id"),
      ((col("id") / 64).cast("long") * 4).as("x"),
      (pmod(col("id"), lit(64L)) * 4).as("y"))
    val z = pts.withColumn("z", ZOrder.interleave8($"x", $"y"))
    def scanned(stats: org.apache.spark.sql.DataFrame): Long = stats
      .filter($"y_max" >= 64L && $"y_min" <= 127L)
      .count()
    val linear = scanned(ZOrder.bucketStats(z, 16, "x", "y", $"x", $"id"))
    val zord = scanned(ZOrder.bucketStats(z, 16, "x", "y", $"z", $"id"))
    assert(linear === 16L, "x-sorted layout must scan every bucket")
    assert(zord === 4L, s"z-sorted layout must confine the slab, scanned $zord")
  }
}
