package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 / WARC/1.x) ingestion — the wire
  * format every public web crawl ships (Common Crawl, IA), and the
  * true head of a pretraining pipeline (r14 verdict task #4): one
  * .warc.gz file is a sequence of GZIP members, each holding one or
  * more records of the form
  *
  *   WARC/1.0\r\n  <header-lines>\r\n  \r\n  <Content-Length bytes>
  *   \r\n\r\n
  *
  * java.util.zip's GZIPInputStream already handles concatenated
  * members (it probes for a further member after each trailer), so
  * the whole reader is pure JVM — the ext/Png DEFLATE pattern.
  *
  * Spark shape: whole-file payloads arrive as binary rows (the
  * `binaryFile` source, or any blob column) and parse per-partition
  * via mapPartitions — payloads never collect to the driver, decode
  * amortizes across the partition batch, and the output feeds the
  * existing gates directly ([[graft.ext.Html]] extraction over
  * response bodies, StreamGate/MultiModal downstream). At crawl scale
  * the unit of parallelism is the FILE (Common Crawl ships ~50k
  * ~1 GB segments per dump), which is exactly the partitioning this
  * source inherits from the file listing.
  *
  * Degradation contract (the S1 non-relational-edge convention): a
  * TRUNCATED record — payload cut short, or a header block the frame
  * rules reject mid-stream — yields what was recoverable with
  * `truncated = true` on the cut record, and parsing stops at the
  * damage instead of failing the task or resynchronizing on garbage.
  */
object Warc {

  /** One parsed record; `payload` is the raw block content (for
    * response records: HTTP headers + body).
    */
  final case class WarcRecord(
      path: String, offset: Long, warc_type: String, target_uri: String,
      warc_date: String, record_id: String, content_type: String,
      content_length: Long, truncated: Boolean, payload: Array[Byte])

  private val Gzip = Array(0x1f.toByte, 0x8b.toByte)

  /** Parse every record in a (possibly multi-member gzip) WARC blob. */
  def parse(bytes: Array[Byte], path: String = ""): Seq[WarcRecord] = {
    val in: InputStream =
      if (bytes.length >= 2 && bytes(0) == Gzip(0) && bytes(1) == Gzip(1))
        new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      else new ByteArrayInputStream(bytes)
    try parseStream(in, path) finally in.close()
  }

  private def parseStream(in: InputStream, path: String): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    val reader = new LineReader(in)
    var recordIdx = 0L
    var done = false
    while (!done) {
      // skip inter-record blank lines (\r\n\r\n separators)
      var line: String = null
      try {
        line = reader.readLine()
        while (line != null && line.isEmpty) line = reader.readLine()
      } catch { case _: EOFException => line = null }
      if (line == null) done = true
      else if (!line.startsWith("WARC/")) {
        done = true // garbage where a version line belongs: stop, don't resync
      } else {
        // header block: Name: value until the blank line
        val headers = scala.collection.mutable.Map[String, String]()
        var truncated = false
        try {
          var h = reader.readLine()
          while (h != null && h.nonEmpty) {
            val colon = h.indexOf(':')
            if (colon > 0)
              headers(h.substring(0, colon).trim.toLowerCase) =
                h.substring(colon + 1).trim
            h = reader.readLine()
          }
          if (h == null) truncated = true
        } catch { case _: EOFException => truncated = true }
        val declared = headers.get("content-length")
          .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(-1L)
        if (declared < 0) {
          // unframed record (no usable Content-Length): nothing after
          // it can be located — emit the header shell as truncated
          out += rec(path, recordIdx, headers, declared = 0L,
            truncated = true, payload = Array.emptyByteArray)
          done = true
        } else if (declared > Int.MaxValue.toLong - 8) {
          // declared length exceeds the JVM array cap: the payload
          // cannot be materialized OR skipped reliably, so nothing
          // after this record can be located — degrade exactly like a
          // short read (truncated=true, stop) instead of emitting a
          // silently capped payload as clean
          out += rec(path, recordIdx, headers, declared,
            truncated = true, payload = Array.emptyByteArray)
          done = true
        } else {
          val payload = new Array[Byte](declared.toInt)
          val got = if (truncated) 0 else reader.readFully(payload)
          val cut = truncated || got < payload.length
          out += rec(path, recordIdx, headers, declared,
            truncated = cut,
            payload = if (cut) payload.take(math.max(got, 0)) else payload)
          if (cut) done = true
        }
        recordIdx += 1
      }
    }
    out.toSeq
  }

  private def rec(path: String, idx: Long,
      headers: scala.collection.Map[String, String], declared: Long,
      truncated: Boolean, payload: Array[Byte]): WarcRecord =
    WarcRecord(
      path = path,
      offset = idx,
      warc_type = headers.getOrElse("warc-type", ""),
      target_uri = headers.getOrElse("warc-target-uri", ""),
      warc_date = headers.getOrElse("warc-date", ""),
      record_id = headers.getOrElse("warc-record-id", ""),
      content_type = headers.getOrElse("content-type", ""),
      content_length = declared,
      truncated = truncated,
      payload = payload)

  /** CRLF line reader over a raw InputStream that does NOT read ahead
    * past the line it returns (a BufferedReader would swallow payload
    * bytes). WARC headers are ASCII by spec.
    */
  private final class LineReader(in: InputStream) {
    /** null at clean EOF before any byte; EOFException mid-line. */
    def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = in.read()
      }
      if (b < 0) throw new EOFException("EOF mid-line")
      sb.toString
    }

    /** Read exactly buf.length bytes if available; returns bytes read. */
    def readFully(buf: Array[Byte]): Int = {
      var off = 0
      var n = 0
      while (off < buf.length && n >= 0) {
        n = in.read(buf, off, buf.length - off)
        if (n > 0) off += n
      }
      off
    }
  }

  /** Parse a DataFrame of whole-file blobs — columns (`pathCol`
    * string, `contentCol` binary), the `binaryFile` source shape —
    * into one row per WARC record. Per-partition batch parse; the
    * [[MultiModal.featurize]] dataflow posture.
    */
  def records(files: DataFrame, pathCol: String = "path",
      contentCol: String = "content"): Dataset[WarcRecord] = {
    import files.sparkSession.implicits._
    val pIdx = files.schema.fieldIndex(pathCol)
    val cIdx = files.schema.fieldIndex(contentCol)
    files.mapPartitions { batch =>
      batch.flatMap { row =>
        parse(row.getAs[Array[Byte]](cIdx), row.getString(pIdx))
      }
    }
  }

  /** Response-record HTML bodies, extraction-ready: drops the HTTP
    * header block (everything through the first \r\n\r\n) from each
    * `response` payload and decodes UTF-8 (replacement chars for
    * invalid bytes — crawls are never clean). Feed straight into
    * [[graft.ext.Html.mainText]].
    */
  def htmlBodies(records: Dataset[WarcRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records
      .filter(r => r.warc_type == "response" && !r.truncated)
      .map { r =>
        val sep = indexOfCrlfCrlf(r.payload)
        val body =
          if (sep < 0) r.payload else r.payload.drop(sep + 4)
        (r.target_uri, r.warc_date,
          new String(body, java.nio.charset.StandardCharsets.UTF_8))
      }
      .toDF("target_uri", "warc_date", "html")
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
