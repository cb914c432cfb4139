package graft.ext

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct}

/** Vector-similarity operators over `array<float>` embedding columns
  * (north-star extension surface).
  *
  * All arithmetic is higher-order built-ins (`zip_with` + `aggregate`)
  * in double precision — codegen-friendly, no UDF, and a sequential
  * left-fold summation order that the DuckDB oracle reproduces exactly.
  *
  * Scale posture: the brute-force scorer is the correctness baseline and
  * is only ever joined against a *broadcast* query set or within an LSH /
  * IVF bucket; nothing here materializes an unbucketed n×n cross join.
  */
object Similarity {

  /** float[] → double[] once, before any arithmetic, so accumulation
    * happens in double (and matches the oracle's CAST(... AS DOUBLE[])).
    */
  def toDoubleArray(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via the native codegen'd expression
    * ([[org.apache.spark.sql.graft.DotProduct]]) — the per-row hot op
    * of every power-iteration round and projection scoring pass. Same
    * sequential left fold as [[dotHof]] and the oracle; ExtSpec
    * asserts bit-equality.
    */
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** HOF formulation — the pure-built-in reference implementation
    * [[dot]] must match bit-for-bit.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** HOF formulation — the pure-built-in reference implementation.
    * [[cosine]] (the native expression) is bit-identical; ExtSpec
    * asserts the equivalence.
    */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Cosine similarity via the native codegen'd expression
    * ([[graft.expressions.CosineSimilarity]]): one fused loop, no
    * intermediate arrays, same fold order as [[cosineHof]] and the
    * oracle.
    */
  def cosine(a: Column, b: Column): Column =
    GraftExpressionBridge.column(CosineSimilarity(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane j has
    * integer coefficient ((i·37 + j·101) mod 13) − 6 at dimension i
    * (0-based). Integer coefficients keep every product exactly
    * representable, so Spark and the oracle compute bit-identical
    * projections. Shared with the oracle SQL via [[hyperplane]].
    */
  def hyperplane(j: Int, dims: Int): Seq[Int] =
    (0 until dims).map(i => ((i * 37 + j * 101) % 13) - 6)

  /** Corpus-proportional sign-LSH code width (round-15, from the sf10
    * receipt): smallest P ≥ 8 with n ≤ 256·2^P, capped at 24 — mean
    * bucket population stays ≤ 256 as the corpus grows, so
    * within-bucket candidate mass is ~n·128, LINEAR in n, where a
    * FIXED width is n²/2^P (x10 measured 172× time for 10× data at
    * width 8). Stated as an integer step ladder —
    * 8 + Σ_{t∈[8,24)} [n > 256·2^t] — so the oracle can compute the
    * identical width with no float log anywhere. At the demo corpus
    * sizes (n ≤ 65536: every SF through sf1) this resolves to 8, the
    * historical width, so small-SF results are unchanged by
    * construction.
    */
  def planesFor(n: Long): Int =
    8 + (8 until 24).count(t => n > 256L * (1L << t))

  /** Sign-LSH bucket id in [0, 2^planes): bit j = sign of the projection
    * onto hyperplane j. Near-identical vectors agree on every sign with
    * high probability, so near-dup candidate generation becomes an
    * equi-join on this bucket — the LSH shape that replaces all-pairs.
    */
  def signBucket(v: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { j =>
      val plane = array(hyperplane(j, dims).map(x => lit(x.toDouble)): _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
