package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.avg
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

  test("rejects a partitioned table root instead of flattening it") {
    // pointed at the table ROOT, a rewrite would materialize the
    // partition column into data files and destroy the dt= layout —
    // compact() must refuse, leaving the table untouched
    val root = Files.createTempDirectory("compact-root").resolve("tbl").toString
    Seq((java.sql.Date.valueOf("2022-08-29"), 1L),
      (java.sql.Date.valueOf("2022-08-30"), 2L))
      .toDF("dt", "v").write.partitionBy("dt").parquet(root)
    val err = intercept[IllegalArgumentException] {
      Compact.compact(spark, root, targetRowsPerFile = 100)
    }
    assert(err.getMessage.contains("subdirectories"))
    // untouched: both partitions still read back
    assert(spark.read.parquet(root).count() === 2L)
  }

  test("composes with the ingest path: compacting a dt partition keeps the rollup") {
    // the intended deployment: Ingest's per-micro-batch appends leave
    // several files inside each dt= partition; compacting one
    // partition directory must not change what the rollup reads
    val root = Files.createTempDirectory("compact-raw")
    val raw = root.resolve("raw").toString
    def batch(temp: Double) = Seq((java.sql.Date.valueOf("2022-08-29"), temp))
      .toDF("dt", "temp")
    // three drip appends → ≥ 3 files in the single dt partition
    (1 to 3).foreach(i =>
      batch(300.0 + i).write.mode("append").partitionBy("dt").parquet(raw))
    val part = root.resolve("raw/dt=2022-08-29").toString
    val beforeAvg = spark.read.parquet(raw).agg(avg($"temp")).head().getDouble(0)

    val (before, after, rows) = Compact.compact(spark, part, targetRowsPerFile = 100)

    assert(before >= 3 && after === 1 && rows === 3L)
    val d = spark.read.parquet(raw)
    assert(d.count() === 3L)
    // dt still comes from the partition path; values intact
    assert(d.select($"dt".cast("string")).distinct().as[String].collect()
      .toSeq === Seq("2022-08-29"))
    assert(d.agg(avg($"temp")).head().getDouble(0) === beforeAvg)
  }
}
