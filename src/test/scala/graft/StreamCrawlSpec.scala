package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Shards
import graft.streaming.{StreamBloom, StreamCrawl}

/** STREAMING WARC INGESTION (round-16, verdict task #6): the crawl
  * head — binaryFile stream → Warc.records → Html.mainText →
  * StreamGate — proven end to end with the X170 kill/restart
  * discipline: the query dies between micro-batches with mid-write
  * garbage left behind, a NEW query restarts from the checkpoint, and
  * the final shard content is byte-for-byte the uninterrupted run's —
  * including the stateful dedup stage suppressing a duplicate that
  * arrives on the far side of the kill.
  */
class StreamCrawlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // -- WARC fixture plumbing (the WarcSpec builders) ------------------
  private def record(wtype: String, uri: String,
      payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder()
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $wtype\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-08-16T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:test:$wtype:$uri>\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("US-ASCII") ++ payload ++
      "\r\n\r\n".getBytes("US-ASCII")
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  private def httpResponse(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")

  private def page(title: String, body: String): String =
    s"<html><head><title>$title</title></head><body>" +
      s"<nav><a href=\"/\">Home</a></nav><p>$body</p></body></html>"

  // the duplicated body crosses the kill boundary: file B's copy must
  // be suppressed by dedup STATE recovered from the checkpoint
  private val bodyDup = "a body of prose that appears under two urls"
  private val bodyBlocked = "contaminated eval text planted for the bloom gate"
  private val bodyFresh = "a fresh closing document with novel words"

  private def warcA: Array[Byte] = {
    val info = record("warcinfo", "",
      "software: graft-test\r\n".getBytes("US-ASCII"))
    val r1 = record("response", "https://a.test/dup",
      httpResponse(page("One", bodyDup)))
    val r2 = record("response", "https://a.test/blocked",
      httpResponse(page("Two", bodyBlocked)))
    gzipMember(info ++ r1) ++ gzipMember(r2)
  }

  private def warcB: Array[Byte] = {
    val req = record("request", "https://b.test/dup",
      "GET /dup HTTP/1.1\r\n".getBytes("US-ASCII"))
    val r1 = record("response", "https://b.test/dup",
      httpResponse(page("OneAgain", bodyDup)))
    val r2 = record("response", "https://b.test/fresh",
      httpResponse(page("Three", bodyFresh)))
    gzipMember(req) ++ gzipMember(r1) ++ gzipMember(r2)
  }

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  private def drop(dir: String, name: String, bytes: Array[Byte]): Unit =
    Files.write(Paths.get(dir, name), bytes)

  test("extracted streaming docs match the batch reader's extraction") {
    import spark.implicits._
    val in = tmp("crawl_docs_in")
    drop(in, "a.warc.gz", warcA)
    // the docs() transform applied to a BATCH read of the same files
    // (the streaming plan is the identical narrow chain)
    val batch = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(in)
    val got = StreamCrawl.docs(batch)
      .select($"target_uri", $"text").as[(String, String)]
      .collect().toMap
    assert(got.keySet === Set("https://a.test/dup", "https://a.test/blocked"))
    assert(got("https://a.test/dup").contains(bodyDup))
    // nav boilerplate is extracted away by the link-density rule
    assert(!got("https://a.test/dup").contains("Home"))
  }

  test("crawl head: restart from checkpoint == uninterrupted, byte-for-byte") {
    import spark.implicits._
    val bytes = StreamBloom.filterBytes(
      // block by the EXTRACTED text — compute it with the same chain
      StreamCrawl.docs(
        spark.createDataFrame(Seq(
          ("m.warc.gz", java.sql.Timestamp.valueOf("2026-08-16 00:00:00"),
            warcA.length.toLong, warcA)))
          .toDF("path", "modificationTime", "length", "content"))
        .filter($"target_uri" === "https://a.test/blocked")
        .select($"text"),
      md5(col("text")), 100L, 0.001)
    val rules = Seq("a" -> "body", "a" -> "fresh")

    def run(kill: Boolean): Set[(Long, Long, String, Long, Long, Long)] = {
      val in = tmp("crawl_in"); val out = tmp("crawl_out")
      val ck = tmp("crawl_ck")
      drop(in, "a.warc.gz", warcA)
      val q1 = StreamCrawl.start(spark, in, out, "1 hour", bytes, rules,
        docsPerShard = 2, seed = 5, checkpoint = Some(ck))
      try q1.processAllAvailable() finally if (kill) q1.stop()
      if (kill) {
        // crash residue: a partial batch-1 shard write, no manifest
        Shards.write(Shards.assign(
          Seq((999L, 1L, "junk")).toDF("doc_id", "n_tokens", "tokens_md5")
            .withColumn("_batch_id", lit(1L)),
          col("doc_id"), 2, 5, rankOffset = 4L), out, append = true)
        drop(in, "b.warc.gz", warcB)
        val q2 = StreamCrawl.start(spark, in, out, "1 hour", bytes, rules,
          docsPerShard = 2, seed = 5, checkpoint = Some(ck))
        try q2.processAllAvailable() finally q2.stop()
      } else {
        try {
          drop(in, "b.warc.gz", warcB)
          q1.processAllAvailable()
        } finally q1.stop()
      }
      spark.read.parquet(out)
        .select($"doc_id", $"n_tokens", $"tokens_md5",
          $"shard".cast("long"), $"position", $"_batch_id")
        .as[(Long, Long, String, Long, Long, Long)].collect().toSet
    }

    val ref = run(kill = false)
    val rec = run(kill = true)
    assert(rec === ref)
    // the head kept exactly the two surviving documents: the first
    // copy of the dup and the fresh page — the bloom-blocked page and
    // the cross-kill duplicate are gone, as is the junk row
    val dupId = spark.range(1).select(
      xxhash64(lit("https://a.test/dup"))).head().getLong(0)
    val freshId = spark.range(1).select(
      xxhash64(lit("https://b.test/fresh"))).head().getLong(0)
    assert(ref.map(_._1) === Set(dupId, freshId))
    // batch ids resumed across the restart: rec === ref above already
    // compares _batch_id byte-for-byte, so the restarted query's
    // batch numbering continued the checkpoint's rather than starting
    // over. Here only the ORDER is pinned — the fresh doc (file B)
    // landed in a later batch than the dup (file A); the literal id is
    // trigger-schedule-dependent (a watermark-advance no-data batch
    // can slot between the two files).
    def batchOf(id: Long): Long = ref.filter(_._1 == id).map(_._6).head
    assert(batchOf(freshId) > batchOf(dupId))
  }
}
