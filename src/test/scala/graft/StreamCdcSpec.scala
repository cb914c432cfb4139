package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cdc
import graft.streaming.StreamCdc
import graft.streaming.StreamCdc.Change

/** Streaming CDC state: the live view converges to the batch collapse
  * of the same log regardless of how the changes were micro-batched,
  * and deleted keys surface as tombstones.
  */
class StreamCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val batch1 = Seq(
    Change(1L, 1L, "I", 10.0), Change(2L, 1L, "I", 20.0),
    Change(1L, 2L, "U", 11.0))
  private val batch2 = Seq(
    Change(2L, 2L, "D", 0.0),   // delete key 2
    Change(3L, 1L, "I", 30.0),
    Change(1L, 3L, "U", 12.0))

  test("streamed state equals the batch applyLatest on the same log") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamCdc.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_state")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // the memory sink in update mode appends every re-emission; the
      // key's CURRENT row is its latest emission = max n_changes
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"key").orderBy($"n_changes".desc)
      val streamed = spark.table("cdc_state")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .filter($"op" =!= "D")
        .select($"key", $"seq", $"op", $"payload", $"n_changes")
        .as[(Long, Long, String, Double, Long)].collect().toSet

      val batch = Cdc.applyLatest(
        (batch1 ++ batch2).toDS().toDF(), "key", Seq(col("seq")), "op")
        .select($"key", $"seq", $"op", $"payload", $"n_changes")
        .as[(Long, Long, String, Double, Long)].collect().toSet

      assert(streamed == batch,
        s"stream state $streamed != batch collapse $batch")
    } finally q.stop()
  }

  test("mergeInto materializes the live table, drops tombstoned keys, replays idempotently") {
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_merge").toString + "/t"
    val input = MemoryStream[Change]
    val q = StreamCdc.latestState(input.toDS())
      .writeStream.foreachBatch(StreamCdc.mergeInto(dir, buckets = 4) _)
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    def tableState() = spark.read.parquet(dir)
      .select($"key", $"seq", $"op", $"payload", $"n_changes")
      .as[(Long, Long, String, Double, Long)].collect().toSet
    val expected = Set((1L, 3L, "U", 12.0, 3L), (3L, 1L, "I", 30.0, 1L))
    assert(tableState() == expected)

    // at-least-once replay: re-applying the last batch's emissions
    // must leave the table unchanged
    import graft.streaming.StreamCdc.Latest
    val replay = Seq(
      Latest(2L, 2L, "D", 0.0, 2L), Latest(3L, 1L, "I", 30.0, 1L),
      Latest(1L, 3L, "U", 12.0, 3L)).toDS()
    StreamCdc.mergeInto(dir, buckets = 4)(replay, 99L)
    assert(tableState() == expected)
  }

  test("a partition emptied by tombstones is removed from disk") {
    import graft.streaming.StreamCdc.Latest
    val dir = java.nio.file.Files.createTempDirectory("cdc_empty").toString + "/t"
    val init = (0L until 8L).map(k => Latest(k, 1L, "I", k.toDouble, 1L))
    StreamCdc.mergeInto(dir, buckets = 2)(init.toDS(), 0L)
    val byPart = spark.read.parquet(dir)
      .select($"part".cast("int"), $"key").as[(Int, Long)].collect().groupBy(_._1)
    assert(byPart.size == 2, s"8 hashed keys should span both buckets: $byPart")
    val victim = byPart.keys.min
    val tombs = byPart(victim).map(_._2).map(k => Latest(k, 2L, "D", 0.0, 2L))
    StreamCdc.mergeInto(dir, buckets = 2)(tombs.toSeq.toDS(), 1L)
    val left = spark.read.parquet(dir)
      .select($"part".cast("int")).distinct().as[Int].collect().toSeq
    assert(left == Seq(byPart.keys.max))
    assert(!new java.io.File(dir + s"/part=$victim").exists,
      "stale files of the emptied partition must be deleted")
  }

  test("a committed staging dir is swapped on replay, not re-merged") {
    import graft.streaming.StreamCdc.Latest
    val dir = java.nio.file.Files.createTempDirectory("cdc_crash").toString + "/t"
    val init = (0L until 8L).map(k => Latest(k, 1L, "I", k.toDouble, 1L))
    StreamCdc.mergeInto(dir, buckets = 2)(init.toDS(), 0L)
    val parts = spark.read.parquet(dir)
      .select($"part".cast("int")).distinct().as[Int].collect().sorted
    assert(parts.length == 2)
    val Array(keep, drop) = parts

    // Simulate a batch-1 writer that crashed AFTER its commit point:
    // staged data + manifest exist, live table untouched.
    val staging = dir + "/.staging_b1"
    Seq(Latest(42L, 9L, "U", 99.0, 5L)).toDF()
      .withColumn("part", lit(keep))
      .write.partitionBy("part").parquet(staging)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(staging, "_touched"),
      s"$keep keep\n$drop drop\n".getBytes("UTF-8"))

    // Replay of batch 1 delivers SOME batch content, but the manifest
    // means the staged merge is already authoritative — the replay must
    // finish the swap and ignore the re-delivered rows.
    val decoy = Seq(Latest(7777L, 1L, "I", 0.0, 1L)).toDS()
    StreamCdc.mergeInto(dir, buckets = 2)(decoy, 1L)

    val after = spark.read.parquet(dir)
      .select($"part".cast("int"), $"key").as[(Int, Long)].collect().toSet
    assert(after == Set((keep, 42L)),
      s"expected only the staged row to survive, got $after")
    assert(!new java.io.File(staging).exists, "staging must be cleaned up")
  }

  test("first batch over a pre-created empty table dir bootstraps, not wedges") {
    import graft.streaming.StreamCdc.Latest
    // a crash during a first batch's staging write leaves the root dir
    // existing but empty — replay must take the bootstrap branch, not
    // read the empty dir as parquet and fail forever
    val dir = java.nio.file.Files.createTempDirectory("cdc_empty_root")
      .toString + "/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val init = Seq(Latest(1L, 1L, "I", 1.0, 1L), Latest(2L, 1L, "I", 2.0, 1L))
    StreamCdc.mergeInto(dir, buckets = 2)(init.toDS(), 0L)
    val keys = spark.read.parquet(dir)
      .select($"key").as[Long].collect().sorted.toSeq
    assert(keys === Seq(1L, 2L))
  }

  test("a deleted key emits a tombstone with its change count") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamCdc.latestState(input.toDS())
      .writeStream.format("memory").queryName("cdc_tomb")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val tomb = spark.table("cdc_tomb")
        .filter($"key" === 2L && $"op" === "D")
        .select($"seq", $"n_changes").as[(Long, Long)].collect()
      assert(tomb.toSeq == Seq((2L, 2L)))
    } finally q.stop()
  }
}
