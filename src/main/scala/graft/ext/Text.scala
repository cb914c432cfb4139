package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators (the
  * north-star extension surface of BASELINE.md; not present in the
  * reference, which has no free-text processing).
  *
  * Everything is a pure column expression built from codegen'd built-ins
  * and higher-order functions — no UDFs, no shuffle, no driver work — so
  * a tokenize/shingle/fingerprint pass over 100 TB of documents is a
  * single narrow map stage.
  *
  * Cross-engine determinism: hashes are md5-based (identical in Spark and
  * DuckDB, which the correctness oracle runs on). At pure-Spark scale
  * `xxhash64` would be cheaper; md5 is the portable choice and the hash
  * is not the bottleneck of any operator here.
  */
object Text {

  val HexDigits = "0123456789abcdef"

  /** Tiny English stopword list for the lang-ID / quality heuristics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is")

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Distinct word n-gram shingles (default 3), the MinHash/Jaccard
    * unit, via the single-pass native expression
    * ([[org.apache.spark.sql.graft.WordShingles]]). Docs with fewer
    * than `n` tokens yield an empty shingle set.
    */
  def wordShingles(toks: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      org.apache.spark.sql.graft.WordShingles(
        org.apache.spark.sql.GraftExpressionBridge.expression(toks), n))

  /** Unicode normalization (UAX #15) via the native expression
    * ([[org.apache.spark.sql.graft.UnicodeNormalize]]) — Spark ships no
    * built-in; web text mixes composed and decomposed grapheme forms,
    * which fractionates exact dedup and token counts unless normalized
    * first. `form` ∈ {NFC, NFD, NFKC, NFKD}.
    */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      org.apache.spark.sql.graft.UnicodeNormalize(
        org.apache.spark.sql.GraftExpressionBridge.expression(text), form))

  /** Pure-HOF reference formulation of [[wordShingles]] — kept for the
    * ExtSpec equivalence assertion.
    */
  def wordShinglesHof(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("long")

  def stopwordRatio(toks: Column): Column =
    stopwordCount(toks).cast("double") / size(toks).cast("double")

  /** Type-token ratio (distinct / total) — a standard lexical-diversity
    * quality signal.
    */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Composite document quality score in [0, 1]: length saturation +
    * lexical diversity + stopword plausibility.
    */
  def qualityScore(nTokens: Column, ttr: Column, stopRatio: Column): Column =
    lit(0.25) * least(nTokens.cast("double") / 100.0, lit(1.0)) +
      lit(0.5) * ttr +
      lit(0.25) * least(stopRatio * 5.0, lit(1.0))

  /** Value in [0, 15] of hex digit `pos` (1-based) of md5(t) — the
    * portable "hash to small int" trick shared with the DuckDB oracle
    * (`locate` here, `strpos` there).
    */
  private def hexDigitSql(tok: String, pos: String): String =
    s"(locate(substr(md5($tok), $pos, 1), '$HexDigits') - 1)"

  /** Polynomial rolling-hash fingerprint over the token stream:
    * h := (h * 31 + byte(tok)) mod 1e9+7, byte = first two md5 hex
    * digits. Order-sensitive (unlike the shingle-set ops), so
    * re-orderings of the same bag of words fingerprint differently.
    */
  def rollingFingerprint(toksCol: String): Column = expr(
    s"""aggregate($toksCol, CAST(0 AS BIGINT), (h, t) ->
       |  pmod(h * 31 + ${hexDigitSql("t", "1")} * 16 + ${hexDigitSql("t", "2")},
       |       1000000007))""".stripMargin)

  /** md5 hex digest per token — computed ONCE, then shared by all 16
    * SimHash bit extractions (recomputing md5 inside the per-bit loop
    * was the dominant cost of the fingerprint pass).
    */
  def md5Array(toksCol: String): Column = expr(s"transform($toksCol, t -> md5(t))")

  /** 16-bit SimHash over a precomputed md5-digest array ([[md5Array]]):
    * bit b of the fingerprint is the sign of the sum over tokens of
    * (2·bit_b(md5) − 1). Near-duplicate docs differ in few bits
    * (Charikar 2002); identical token sets hash identically.
    * `floor(d / 2^k) mod 2` extracts bit k of hex digit d — kept
    * arithmetic (not bit-ops) for portability with the oracle SQL.
    */
  def simhash16(md5sCol: String): Column = expr(
    s"""aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc +
       |  IF(aggregate($md5sCol, CAST(0 AS BIGINT), (a2, m) ->
       |       a2 + 2 * pmod(CAST(floor(
       |         (locate(substr(m, CAST(b DIV 4 AS INT) + 1, 1), '$HexDigits') - 1)
       |           / pow(2, CAST(b % 4 AS INT))) AS BIGINT), 2) - 1) > 0,
       |     CAST(pow(2, CAST(b AS INT)) AS BIGINT), CAST(0 AS BIGINT)))""".stripMargin)
}
