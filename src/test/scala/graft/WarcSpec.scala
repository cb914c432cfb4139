package graft

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Html
import graft.sources.Warc

/** WARC.gz ingestion (r14 verdict task #4) against synthetic fixtures:
  * record framing, multi-member gzip, multi-record members, truncation
  * degradation, and the handoff into the HTML extraction head.
  */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def record(wtype: String, uri: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder()
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $wtype\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2026-08-16T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:test:$wtype:$uri>\r\n"
    extraHeaders.foreach { case (k, v) => h ++= s"$k: $v\r\n" }
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
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

  private val page1 =
    "<html><head><title>One</title></head><body>" +
      "<nav><a href=\"/\">Home</a></nav>" +
      "<p>First page body text with enough words to matter.</p>" +
      "</body></html>"
  private val page2 =
    "<html><head><title>Two</title></head><body>" +
      "<p>Second page content here.</p>" +
      "<p class=\"x\"><a href=\"/l\">all boilerplate anchor text</a></p>" +
      "</body></html>"

  private def fixture: Array[Byte] = {
    val info = record("warcinfo", "",
      "software: graft-test\r\n".getBytes("US-ASCII"))
    val r1 = record("response", "https://a.test/one", httpResponse(page1))
    val req = record("request", "https://b.test/two",
      "GET /two HTTP/1.1\r\n".getBytes("US-ASCII"))
    val r2 = record("response", "https://b.test/two", httpResponse(page2))
    // member 1 carries TWO records (allowed by the spec), members 2-3
    // one each — the Common Crawl per-record convention
    gzipMember(info ++ r1) ++ gzipMember(req) ++ gzipMember(r2)
  }

  test("multi-member gzip parses every record with headers intact") {
    val recs = Warc.parse(fixture, "f.warc.gz")
    assert(recs.map(_.warc_type) ===
      Seq("warcinfo", "response", "request", "response"))
    assert(recs.map(_.offset) === Seq(0L, 1L, 2L, 3L))
    assert(recs(1).target_uri === "https://a.test/one")
    assert(recs(1).warc_date === "2026-08-16T00:00:00Z")
    assert(recs(1).record_id === "<urn:test:response:https://a.test/one>")
    assert(recs.forall(!_.truncated))
    assert(recs(1).content_length === recs(1).payload.length.toLong)
    assert(new String(recs(3).payload, "UTF-8").contains("Second page"))
  }

  test("uncompressed WARC bytes parse identically") {
    val info = record("warcinfo", "", "x: y\r\n".getBytes("US-ASCII"))
    val r1 = record("response", "https://a.test/one", httpResponse(page1))
    val recs = Warc.parse(info ++ r1)
    assert(recs.length === 2 && recs.forall(!_.truncated))
  }

  test("truncated payload degrades: partial record flagged, parse stops") {
    val full = record("response", "https://a.test/one", httpResponse(page1))
    val cut = full.take(full.length - (page1.length / 2) - 4)
    val recs = Warc.parse(cut)
    assert(recs.length === 1)
    assert(recs(0).truncated)
    assert(recs(0).payload.length < recs(0).content_length)
    // what WAS recovered is the true prefix
    assert(new String(recs(0).payload, "UTF-8").startsWith("HTTP/1.1 200"))
  }

  test("a record without Content-Length cannot be framed: shell + stop") {
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://x.test/\r\n\r\n").getBytes("US-ASCII") ++
      httpResponse(page1)
    val recs = Warc.parse(bad)
    assert(recs.length === 1 && recs(0).truncated &&
      recs(0).payload.isEmpty)
  }

  test("garbage where a version line belongs stops cleanly") {
    val recs = Warc.parse("not a warc at all\r\n".getBytes("US-ASCII"))
    assert(recs.isEmpty)
  }

  test("records() is a per-partition batch parse; htmlBodies feeds Html") {
    import spark.implicits._
    val files = Seq(("f1.warc.gz", fixture)).toDF("path", "content")
    val recs = Warc.records(files)
    assert(recs.count() === 4L)
    val main = Html.mainText(col("html"))
    val out = Warc.htmlBodies(recs)
      .select(col("target_uri"), main.as("main"))
      .orderBy(col("target_uri"))
      .collect()
    assert(out.length === 2)
    assert(out(0).getString(1) ===
      "First page body text with enough words to matter.")
    assert(out(1).getString(1) === "Second page content here.")
  }
}
