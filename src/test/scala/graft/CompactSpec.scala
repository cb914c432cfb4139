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

  test("recovers a writer killed between the two swap renames") {
    // simulate the documented non-transactional gap: the dying writer
    // renamed the target away to `_compact_retired` but never promoted
    // the staging dir, and (per the SingleWriter crash caveat) left its
    // lock behind
    val parent = Files.createTempDirectory("compact-crash")
    val dir = parent.resolve("t").toString
    val data = (1L to 100L).map(i => (i, s"row-$i"))
    data.toDF("id", "payload").repartition(10).write.parquet(dir)

    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retired = new org.apache.hadoop.fs.Path(parent.toString, "t_compact_retired")
    val staging = new org.apache.hadoop.fs.Path(parent.toString, "t_compact_staging")
    // crash state: staging fully written, target renamed away, no promote
    spark.read.parquet(dir).repartition(1).write.parquet(staging.toString)
    assert(fs.rename(target, retired))
    fs.create(graft.ops.SingleWriter.lockFor(target), false).close()

    // 1) the stale lock blocks — loud, not silent interleaving
    intercept[graft.ops.SingleWriter.ConcurrentWriteException] {
      Compact.compact(spark, dir, targetRowsPerFile = 50)
    }
    // 2) operator removes the stale lock; the next compact self-repairs:
    //    rolls the retired dir back, discards stale staging, re-compacts
    fs.delete(graft.ops.SingleWriter.lockFor(target), false)
    val (before, after, rows) = Compact.compact(spark, dir, targetRowsPerFile = 50)
    assert(before === 10 && after === 2 && rows === 100L)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq === data)
    assert(!fs.exists(retired) && !fs.exists(staging))
  }

  test("a writer killed before the swap leaves the source untouched and recoverable") {
    val parent = Files.createTempDirectory("compact-crash2")
    val dir = parent.resolve("t").toString
    (1L to 40L).toDF("id").repartition(4).write.parquet(dir)
    // crash state: staging half-written (here: written with WRONG data to
    // prove it is discarded, not promoted), target intact, lock gone
    val staging = new org.apache.hadoop.fs.Path(parent.toString, "t_compact_staging")
    Seq(999L).toDF("id").write.parquet(staging.toString)

    val (before, after, rows) = Compact.compact(spark, dir, targetRowsPerFile = 100)
    assert(before === 4 && after === 1 && rows === 40L)
    assert(spark.read.parquet(dir).as[Long].collect().sorted.toSeq === (1L to 40L))
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

  // ------------------- transactional compaction (round-14 verdict #9)

  test("compactVersioned: snapshot-pointer commit, rows preserved, files shrink") {
    val root = Files.createTempDirectory("compact-v").resolve("t").toString
    val data = (1L to 1000L).map(i => (i, s"row-$i"))
    graft.ops.Versioned.publish(data.toDF("id", "payload").repartition(20), root)

    val (before, after, rows) =
      Compact.compactVersioned(spark, root, targetRowsPerFile = 500)

    assert(before === 20 && after === 2 && rows === 1000L)
    assert(graft.ops.Versioned.current(spark, root) === Some(2L))
    val back = graft.ops.Versioned.read(spark, root)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq === data)
  }

  test("compactVersioned: concurrent readers see old-or-new, never mid-swap") {
    // the property the rename-swap compact() cannot give: a reader
    // polling the table THROUGHOUT the compaction must always resolve a
    // complete snapshot — full row count, every id present — because
    // the commit is one atomic marker creation
    val root = Files.createTempDirectory("compact-vr").resolve("t").toString
    val n = 500L
    graft.ops.Versioned.publish(
      (1L to n).toDF("id").repartition(16), root)

    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val got = graft.ops.Versioned.read(spark, root)
            .agg(org.apache.spark.sql.functions.count($"id"),
              org.apache.spark.sql.functions.sum($"id")).head()
          val (c, s) = (got.getLong(0), got.getLong(1))
          if (c != n || s != n * (n + 1) / 2)
            failures.add(s"partial snapshot: count=$c sum=$s")
          reads.incrementAndGet()
        } catch {
          case e: Exception => failures.add(s"reader threw: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      (1 to 3).foreach { _ =>
        val (_, _, rows) =
          Compact.compactVersioned(spark, root, targetRowsPerFile = 250)
        assert(rows === n)
      }
    } finally {
      stop = true
      reader.join(30000)
    }
    assert(reads.get() > 0, "reader never completed a poll — test is vacuous")
    assert(failures.isEmpty,
      s"concurrent reader observed a broken snapshot: ${failures.peek()}")
  }

  test("publishIf CAS: a rewrite computed from a stale snapshot cannot commit") {
    val root = Files.createTempDirectory("compact-vcas").resolve("t").toString
    graft.ops.Versioned.publish((1L to 10L).toDF("id"), root) // v=1
    // a faster writer lands v=2 while our rewrite is "in flight"
    graft.ops.Versioned.publish((1L to 20L).toDF("id"), root) // v=2
    // rewrite derived from v=1 must NOT roll v=2 back
    assert(graft.ops.Versioned.publishIf(
      (1L to 10L).toDF("id").repartition(1), root, expected = 1L).isEmpty)
    assert(graft.ops.Versioned.read(spark, root).count() === 20L)
    // derived from the CURRENT snapshot it commits
    assert(graft.ops.Versioned.publishIf(
      (1L to 20L).toDF("id").repartition(1), root, expected = 2L) ===
      Some(3L))
    assert(graft.ops.Versioned.read(spark, root).count() === 20L)
    // and compactVersioned retries through a lost race to success
    val (_, after, rows) =
      Compact.compactVersioned(spark, root, targetRowsPerFile = 1000)
    assert(after === 1 && rows === 20L)
  }
}
