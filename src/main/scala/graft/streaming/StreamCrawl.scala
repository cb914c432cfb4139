package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** STREAMING WARC INGESTION — the crawl head as a continuous query
  * (round-16, verdict task #6): the batch chain the r15 surface
  * proved piecewise ([[graft.sources.Warc]] → [[graft.ext.Html]] →
  * [[StreamGate]]) composed into ONE streaming pipeline,
  *
  *   `readStream(binaryFile over *.warc.gz)` → Warc.records →
  *   response bodies → Html.mainText → dedup → decontaminate →
  *   BPE-encode → manifest-committed shard append,
  *
  * so a crawl dump directory drains into training shards with
  * exactly-once content under kill/restart (the X170 discipline
  * applied to the crawl head; StreamCrawlSpec pins restart ==
  * uninterrupted byte-for-byte).
  *
  * Shape notes, in Spark's execution model:
  *  - the file source's unit of parallelism is the WARC FILE — the
  *    partitioning Common Crawl ships (~1 GB segments), so a 1000-
  *    executor cluster drains a dump at file granularity with no
  *    repartition; offsets (which files are committed) live in the
  *    checkpoint WAL;
  *  - everything between the source and the one stateful stage
  *    (dedup's watermarked state store) is a NARROW map — record
  *    parse, HTTP-header strip, UTF-8 decode, main-content
  *    extraction, quality filter — batch-amortized via the same
  *    mapPartitions posture as the batch reader, payloads never on
  *    the driver;
  *  - the sink is [[StreamShards]]' manifest protocol, so replayed
  *    in-flight batches after a crash are idempotent.
  */
object StreamCrawl {

  /** The `binaryFile` source's fixed schema — readStream requires it
    * stated (streaming sources don't infer).
    */
  val BinaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming source over a directory of WARC files. */
  def files(spark: SparkSession, dir: String,
      glob: String = "*.warc.gz"): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(dir)

  /** WARC blobs → curation-ready documents: response records only,
    * HTTP headers stripped, main content extracted. Columns:
    * `doc_id` (64-bit hash of the record id — stable across replays),
    * `target_uri`, `text`, `ts` (WARC-Date). Rows whose extracted
    * main text is empty (pure-boilerplate or non-HTML payloads) are
    * dropped at the head — the standard crawl-head discard.
    */
  def docs(warcFiles: DataFrame): DataFrame = {
    val recs = graft.sources.Warc.records(warcFiles)
    graft.sources.Warc.htmlBodies(recs)
      .withColumn("text", graft.ext.Html.mainText(col("html")))
      .filter(length(col("text")) > 0)
      .withColumn("doc_id", xxhash64(col("target_uri")))
      .withColumn("ts", to_timestamp(col("warc_date")))
      .select(col("doc_id"), col("target_uri"), col("text"), col("ts"))
  }

  /** The full head: WARC directory → [[StreamGate.start]]'s composed
    * gate (dedup → bloom decontaminate → BPE encode → shard append).
    * `checkpoint` is the restart seam — same contract as the gate's.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
      watermark: String, bloomBytes: Array[Byte],
      rules: Seq[(String, String)], docsPerShard: Int, seed: Int,
      checkpoint: Option[String] = None): StreamingQuery =
    StreamGate.start(docs(files(spark, inDir)), "text", "ts", watermark,
      bloomBytes, rules, "doc_id", outDir, docsPerShard, seed, checkpoint)
}
