package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming acceptance gate against a FROZEN reference score
  * distribution — the serving form of x102's Pareto retention rule
  * (compute the corpus quality CDF offline, then gate an ingest
  * stream against it forever).
  *
  * The frozen state is the DISTINCT-SCORE histogram of the reference
  * corpus — value-bounded (a ppm score has ≤ 1e6+1 distinct values;
  * in practice a few hundred — the x64/x89 domain-bounded
  * adjudication class), collected once and shipped as one array
  * literal. Gating is then a PURE NARROW MAP (the StreamNb/StreamBloom
  * composability class): an `aggregate` fold counts reference scores
  * STRICTLY below the arriving doc's score (exact, ties ranked low —
  * the convention a new doc gets, having no tiebreak id inside the
  * reference), the Pareto draw is the same md5-seeded quantized pow,
  * and the verdict is the same integer comparison.
  *
  * Contract, stated precisely: stream == batch AGAINST THE SAME
  * FROZEN CDF (StreamAcceptSpec pins row identity across micro-batch
  * boundaries, plus hand fixtures for the rank and boundary math).
  * It is NOT the self-ranked x102 demo bit-for-bit: x102 ranks corpus
  * docs among themselves with a doc_id tiebreak; the serving gate
  * ranks each NEW doc against the frozen reference, so tied scores
  * take the tie-class minimum rank — the honest serving semantics,
  * same honesty line as StreamShards' at-least-once statement.
  */
object StreamAccept {

  /** Distinct-score CDF of the reference corpus: (score, count) rows
    * ascending, plus the reference size. Driver state is bounded by
    * the score DOMAIN, never the corpus.
    */
  final case class FrozenCdf(hist: Seq[(Long, Long)], nRef: Long)

  def freeze(ref: DataFrame, score: Column): FrozenCdf = {
    val rows = ref.select(score.cast("long").as("s"))
      .filter(col("s").isNotNull)
      .groupBy(col("s")).agg(count(lit(1)).as("c"))
      .orderBy(col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    FrozenCdf(rows, rows.map(_._2).sum)
  }

  /** Adds (rank_ppm, u_ppm, pareto_e6, keep) to a streaming or batch
    * frame: rank_ppm = strict-below count ·1e6 div (nRef−1), keep iff
    * rank_ppm + pareto_e6 > 1e6 — x102's arithmetic with the frozen
    * reference standing in for the self-ranked corpus.
    */
  def gate(df: DataFrame, idCol: Column, score: Column,
      frozen: FrozenCdf): DataFrame = {
    require(frozen.nRef > 0, "empty reference distribution")
    val hist = typedlit(frozen.hist)
    val denom = math.max(frozen.nRef - 1, 1L)
    df.withColumn("below",
      aggregate(hist, lit(0L), (acc, e) =>
        acc + when(e.getField("_1") < score, e.getField("_2"))
          .otherwise(lit(0L))))
      .withColumn("rank_ppm", expr(s"(below * 1000000) div $denom"))
      .withColumn("u_ppm",
        conv(substring(md5(concat(idCol.cast("string"), lit("#acc"))),
          1, 8), 16, 10).cast("long") % 1000000L)
      .withColumn("pareto_e6",
        round(round(
          pow(lit(1.0) - col("u_ppm").cast("double") / 1000000.0,
            -1.0 / 9.0) - lit(1.0), 6) * 1e6).cast("long"))
      .withColumn("keep", col("rank_ppm") + col("pareto_e6") > 1000000L)
      .drop("below")
  }
}
