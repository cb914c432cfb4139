package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means, a few iterations — a real learned
  * coarse quantizer for IVF-style ANN (upgrading x09's label-as-cell
  * stand-in to trained cells).
  *
  * Scale shape (the standard distributed k-means):
  *  - assignment is a narrow map over the vectors (distance to k
  *    centroid literals, codegen'd array ops);
  *  - the update step is one posexplode + hash aggregate keyed on
  *    (cell, dim) — k·d result rows, collected to the driver as the
  *    ONLY driver-side state (k·d doubles per iteration);
  *  - no randomness anywhere: init = first k vectors in id order, ties
  *    in argmin break to the lowest centroid index, so runs and retries
  *    agree (up to FP reduction order in the avg).
  */
object KMeansLite {

  private def litVec(c: Seq[Double]): Column = array(c.map(lit): _*)

  /** Squared L2 distance between a vector column and a centroid literal. */
  private def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, litVec(c), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Cell assignment: index of the nearest centroid (first minimum →
    * lowest index on ties — deterministic).
    */
  def assign(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val d = array(centroids.map(c => dist2(v, c)): _*)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Sum over points of distance² to the assigned centroid. */
  def inertia(vectors: DataFrame, vCol: String, centroids: Seq[Seq[Double]]): Double =
    vectors.select(
      array_min(array(centroids.map(c => dist2(col(vCol), c)): _*)).as("d"))
      .agg(sum(col("d"))).head().getDouble(0)

  /** `iters` Lloyd iterations from the deterministic seed (first k
    * vectors ordered by `idCol`). Empty cells keep their previous
    * centroid. Returns the k centroids.
    */
  def fit(
      vectors: DataFrame, idCol: String, vCol: String,
      k: Int, iters: Int): Seq[Seq[Double]] = {
    var cents: Seq[Seq[Double]] = vectors.orderBy(col(idCol)).limit(k)
      .select(col(vCol)).collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iters) {
      val means = vectors
        .select(assign(col(vCol), cents).as("cell"),
          posexplode(col(vCol)).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }
}
