package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Drift
import graft.streaming.StreamDrift

/** Streaming windowed drift monitor: closed-window counts equal the
  * batch aggregation of the same rows regardless of micro-batching,
  * and the KL stage — shared arithmetic with the x54 batch monitor —
  * produces identical integers over streamed and batch-computed
  * counts. A skewed source scores strictly higher drift than one
  * matching the reference mix.
  */
class StreamDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // Window 1 (10:00-11:00): srcA mirrors the reference mix, srcB is
  // skewed hard onto one token. Window 2 (11:00-12:00): srcA only.
  private val w1 = Seq(
    ("srcA", "alpha"), ("srcA", "alpha"), ("srcA", "beta"), ("srcA", "gamma"),
    ("srcB", "alpha"), ("srcB", "alpha"), ("srcB", "alpha"), ("srcB", "alpha"))
    .map { case (s, t) => (ts("2024-05-01 10:15:00"), s, t) }
  private val w2 = Seq(("srcA", "beta"), ("srcA", "gamma"))
    .map { case (s, t) => (ts("2024-05-01 11:20:00"), s, t) }
  private val closer = Seq((ts("2024-05-01 14:00:00"), "srcA", "alpha"))

  // Reference distribution: alpha 4, beta 2, gamma 2 (superset of
  // every source's support, as the contract requires).
  private def reference = Seq(
    ("alpha", 4L), ("beta", 2L), ("gamma", 2L)).toDF("token", "c")

  test("closed-window counts match batch; KL is shared with the batch path") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val stream = input.toDF().toDF("ts", "source", "token")
    val q = StreamDrift.windowedCounts(
        stream, "ts", "source", "token", "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("append").start()
    try {
      input.addData(w1.take(3): _*)
      q.processAllAvailable()
      input.addData(w1.drop(3): _*)
      q.processAllAvailable()
      input.addData(w2: _*)
      q.processAllAvailable()
      input.addData(closer: _*) // watermark closes both windows
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("drift_counts")
      .filter(col("window_start") < "2024-05-01 12:00:00")
    val batch = (w1 ++ w2).toDF("ts", "source", "token")
      .groupBy(window(col("ts"), "1 hour"), col("source"), col("token"))
      .agg(count(lit(1)).as("c_s"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"), col("token"), col("c_s"))

    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window_start").cast("string"), col("source"),
        col("token"), col("c_s"))
      .as[(String, String, String, Long)].collect().toSet
    assert(asSet(streamed) === asSet(batch))

    // KL over streamed counts == KL over batch counts (same shared
    // Drift arithmetic), and the skewed source drifts strictly more
    val klStream = StreamDrift.kl(streamed, reference)
      .select(col("window_start").cast("string"), col("source"),
        col("n_tokens"), col("kl_micro"))
      .as[(String, String, Long, Long)].collect().toSet
    val klBatch = StreamDrift.kl(batch, reference)
      .select(col("window_start").cast("string"), col("source"),
        col("n_tokens"), col("kl_micro"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(klStream === klBatch)

    val byName = klStream.collect {
      case (w, s, _, kl) if w.startsWith("2024-05-01 10:") => s -> kl
    }.toMap
    // srcA's window-1 mix (2,1,1 over alpha/beta/gamma) IS the
    // reference mix (4,2,2 scaled) → exactly zero drift; srcB is
    // all-alpha → strictly positive
    assert(byName("srcA") === 0L)
    assert(byName("srcB") > 0L)
  }

  test("klMicro matches a hand-computed value on a tiny distribution") {
    // group g: counts alpha=3, beta=1 (n_s=4); reference alpha=4,
    // beta=2, gamma=2 (n=8). KL = 3/4·ln(3/4 ÷ 4/8) + 1/4·ln(1/4 ÷ 2/8)
    //    = 0.75·ln 1.5 ≈ 0.304099.
    val counts = Seq(("g", "alpha", 3L), ("g", "beta", 1L))
      .toDF("grp", "token", "c_s")
    val out = Drift.klMicro(counts, Seq("grp"), reference)
      .select(col("n_tokens"), col("n_distinct"), col("kl_micro"))
      .as[(Long, Long, Long)].head()
    assert(out._1 === 4L && out._2 === 2L)
    // integer micro-nats: floor((3·(lnp_s−lnp_c) + 1·(lnp_s−lnp_c))/4)
    // with each ln quantized to 6 decimals first — lands within one
    // micro-unit of the analytic 304099 (ln 2 term cancels exactly)
    assert(math.abs(out._3 - 304099L) <= 1L, s"kl_micro=${out._3}")
  }
}
