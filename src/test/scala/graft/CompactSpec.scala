package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compact

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compaction shrinks the file count and preserves every row") {
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    val data = (1L to 1000L).map(i => (i, s"row-$i"))
    // simulate a drip-fed sink: 20 tiny files
    data.toDF("id", "payload").repartition(20).write.parquet(dir)

    val (before, after, rows) = Compact.compact(spark, dir, targetRowsPerFile = 500)

    assert(before === 20)
    assert(after === 2)
    assert(rows === 1000L)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq === data)
    // staging/retired dirs cleaned up
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(parent.toSet === Set("t"))
  }

  test("a no-op compaction (already one file) stays correct") {
    val dir = Files.createTempDirectory("compact1").resolve("t").toString
    (1L to 10L).toDF("id").coalesce(1).write.parquet(dir)
    val (before, after, rows) = Compact.compact(spark, dir, 1000L)
    assert(before === 1 && after === 1 && rows === 10L)
    assert(spark.read.parquet(dir).count() === 10L)
  }
}
