package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Shards

/** Streaming training-shard write-out — x86's immutable-append
  * contract as a foreachBatch sink: each micro-batch of kept documents
  * becomes FRESH fixed-size shards appended past everything already
  * written, so training jobs can start reading shard N while shard
  * N+1 is still being produced and no shipped (shard, position) ever
  * moves.
  *
  * Exactly-once, manifest-committed (round-12 advice — the previous
  * probe-the-data-for-the-batch-id check could mistake a PARTIAL batch
  * for a committed one and silently drop the retry): a batch counts as
  * committed only when its per-batch manifest file exists under
  * `outDir/_manifests/`, and the manifest is written AFTER the data,
  * from a read-back of what actually landed on disk (row count + max
  * shard id). On replay,
  *  - manifest present  → committed: skip (return 0);
  *  - manifest absent   → never ran, or died mid-write: any shard
  *    directory past the committed high-water mark is garbage from the
  *    failed attempt — delete it and rewrite the whole batch.
  * Within a batch the assignment is [[Shards.assign]] — a pure
  * function of (data, seed) — so the rewrite reproduces byte-identical
  * shards. The `_manifests` name is underscore-prefixed, so parquet
  * readers of `outDir` skip it as a hidden path.
  *
  * Writer model: ONE streaming query owns a shard store (Structured
  * Streaming serializes foreachBatch calls within a query). The
  * manifest protocol makes failure + retry of that single writer safe;
  * it is not a lock against two CONCURRENT queries appending to the
  * same directory — that remains a deployment error, now stated.
  *
  * Scale: cross-batch state is the committed high-water mark, read
  * from the manifest directory (a file listing, one tiny file per
  * batch) — no growing driver state, no state store, no data scan.
  */
object StreamShards {

  /** Append one micro-batch to the shard store. Returns the number of
    * rows written (0 for an empty or already-committed batch).
    */
  def appendBatch(batch: DataFrame, batchId: Long, keyCol: String,
      outDir: String, docsPerShard: Int, seed: Int): Long = {
    if (batch.isEmpty) return 0L
    if (manifestFile(outDir, batchId).exists()) return 0L // committed replay
    val spark = batch.sparkSession
    val committedMax = committedMaxShard(outDir)
    // garbage from a mid-write failure: shard dirs past the committed
    // high-water mark belong to no manifest — remove before rewriting
    dropShardsAbove(outDir, committedMax)
    val nextShard = committedMax + 1
    val assigned = Shards.assign(
      batch.withColumn("_batch_id", lit(batchId)), col(keyCol),
      docsPerShard, seed, rankOffset = nextShard * docsPerShard)
    Shards.write(assigned, outDir, append = true)
    // manifest LAST, from the read-back of the fresh shard dirs only
    // (partition-pruned) — the completion marker records what is
    // actually on disk, not what the lineage would recompute
    val landed = spark.read.parquet(outDir)
      .filter(col("shard").cast("long") >= nextShard)
      .agg(count(lit(1)).as("n"), max(col("shard").cast("long")).as("m"))
      .head()
    writeManifest(outDir, batchId, landed.getLong(0), landed.getLong(1))
    landed.getLong(0)
  }

  /** The written shard store, if any batch has landed yet. An
    * existing-but-empty directory (a sink created ahead of the first
    * batch) counts as no store — parquet can't infer a schema from it.
    */
  def readStore(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val d = new File(outDir)
    val hasShards = d.exists() &&
      Option(d.listFiles()).exists(_.exists(_.getName.startsWith("shard=")))
    if (hasShards) Some(spark.read.parquet(outDir)) else None
  }

  /** foreachBatch function wiring [[appendBatch]] into
    * `writeStream.foreachBatch(StreamShards.sink(...))`.
    */
  def sink(keyCol: String, outDir: String, docsPerShard: Int,
      seed: Int): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      appendBatch(batch, batchId, keyCol, outDir, docsPerShard, seed)
      ()
    }

  // ------------------------------------------------------- manifests

  private def manifestDir(outDir: String) = new File(outDir, "_manifests")

  private def manifestFile(outDir: String, batchId: Long) =
    new File(manifestDir(outDir), s"batch_$batchId.txt")

  /** Highest shard id any COMMITTED batch wrote (-1 before the first
    * commit) — the append high-water mark and the garbage boundary.
    */
  def committedMaxShard(outDir: String): Long = {
    val files = Option(manifestDir(outDir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.startsWith("batch_"))
    if (files.isEmpty) -1L
    else files.map { f =>
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .linesIterator.collectFirst {
          case l if l.startsWith("maxShard=") => l.stripPrefix("maxShard=").toLong
        }.getOrElse(-1L)
    }.max
  }

  /** Write the completion marker via temp-file + atomic rename, so a
    * crash mid-manifest-write leaves no half manifest behind.
    */
  private def writeManifest(outDir: String, batchId: Long,
      rows: Long, maxShard: Long): Unit = {
    val dir = manifestDir(outDir)
    dir.mkdirs()
    val tmp = Paths.get(dir.toString, s".batch_$batchId.tmp")
    Files.write(tmp,
      s"rows=$rows\nmaxShard=$maxShard\n".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(outDir, batchId).toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def dropShardsAbove(outDir: String, committedMax: Long): Unit =
    Option(new File(outDir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.startsWith("shard=") &&
        f.getName.stripPrefix("shard=").toLong > committedMax)
      .foreach(deleteRecursively)

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[File])
      .foreach(deleteRecursively)
    f.delete()
  }
}
