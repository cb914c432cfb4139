package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate graph — the step that
  * turns pairwise near-dup EDGES (Dedup.nearDupPairs, x02) into dedup
  * DECISIONS: every document in a component is a variant of the same
  * underlying text, the component's minimum id is the canonical
  * survivor, everything else is droppable. (The reference has no dedup
  * at all — SURVEY.md §2 bug list — so this whole layer is north-star
  * extension surface.)
  *
  * Algorithm: iterative min-label propagation ("hash-to-min" lite).
  * Every node starts labelled with its own id; each round, every node
  * takes the min of its own label and its neighbors' labels; fixpoint =
  * every node carries its component's global minimum id. Rounds needed =
  * graph diameter — for dedup graphs that is tiny (variants of one text
  * form near-cliques; even chains of re-mutations are short), which is
  * why label propagation is the standard industrial shape for dedup
  * clustering rather than a full large-star/small-star implementation.
  *
  * Scale posture per round: one equi-join of the (symmetrized) edge list
  * against the label table on the node id + one min-aggregate, both
  * hash-partitioned on node id — no broadcast of anything
  * corpus-sized, no driver-side graph. The only driver work is the
  * convergence check, a count of changed labels. Each round's result is
  * locally checkpointed: labels are REBUILT per round, so without
  * truncation the lineage (and Catalyst analysis time) grows linearly
  * with rounds; a lost executor just recomputes from the previous
  * round's checkpoint blocks, and a failed driver restarts the whole
  * (idempotent, deterministic) job — acceptable for an iterative
  * analytic, unlike the durability-critical upsert path (DailyTable)
  * where localCheckpoint was a correctness hazard.
  */
object Components {

  /** @param nodes one row per node (extra columns ignored)
    * @param idCol  node id column in `nodes` (numeric)
    * @param edges  undirected edge list, one row per edge
    * @param aCol   edge endpoint column in `edges`
    * @param bCol   other endpoint column in `edges`
    * @param maxIter hard cap on propagation rounds (diameter bound)
    * @return (idCol, cluster_id) — cluster_id = min node id reachable
    */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // Symmetrize once and keep the (tiny relative to the corpus) edge
    // list materialized across rounds instead of re-deriving it from
    // the candidate-generation pipeline every iteration.
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; a node's new label is the min
      // of its own and everything it heard
      val msgs = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      // labels only ever decrease, so "any strict decrease" = "changed"
      val changed = next.as("n")
        .join(labels.select(col("id"), col("lbl").as("prev")), "id")
        .filter(col("lbl") < col("prev"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }
}
