package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic power iteration for the top principal direction of an
  * embedding corpus (von Mises iteration on the uncentered second
  * moment X'X) — the distributed-linear-algebra sibling of
  * [[KMeansLite]], and its determinism discipline applied to a matrix
  * multiply: plain `sum(double)` per dimension would depend on
  * partial-aggregate merge order, so each vector's per-dimension
  * contribution x_d·(x·v) is quantized to the 2^-24 grid as a LONG,
  * the shuffle sums exact integers (order-free), and the only double
  * ops afterwards (÷2^24, the 64-term norm fold, sqrt, ÷norm) are
  * correctly rounded on identical operands — so Spark's driver-side
  * direction and the oracle's CTE-computed direction agree BIT-FOR-BIT
  * at every iteration (x82).
  *
  * Per iteration: one narrow map (dot + quantize) behind a
  * repartition barrier (the [[KMeansLite]] CollapseProject lesson —
  * without it the dot recomputes once per exploded dimension), one
  * hash aggregate keyed on dim (d result rows), and d longs of driver
  * state. Integer-sum headroom: |x·v| ≤ √d·max|x| keeps per-term
  * magnitude ≤ ~2^27; the exact-sum bound 2^53 holds to ~10^8 vectors
  * — past that, widen the grid or add a per-partition pre-scale.
  */
object PowerIter {

  /** `iters` rounds from the exact deterministic seed v0 = 1/√dims
    * (every component identical, so no data ordering enters the
    * init). Returns the final unit direction.
    */
  def fit(vectors: DataFrame, vCol: String, dims: Int,
      iters: Int): Seq[Double] = {
    var v: Seq[Double] = Seq.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 1 to iters) {
      val vl = typedlit(v)
      val sums = vectors
        .select(Similarity.dot(col(vCol), vl).as("t"), col(vCol))
        .repartition(vectors.sparkSession.sparkContext.defaultParallelism)
        .select(posexplode(transform(col(vCol),
          x => round(x * col("t") * KMeansLite.QuantScale).cast("long")))
          .as(Seq("dim", "u")))
        .groupBy(col("dim")).agg(sum(col("u")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val w = (0 until dims).map(d =>
        sums.getOrElse(d, 0L) / KMeansLite.QuantScale)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    v
  }
}
