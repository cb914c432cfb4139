package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * Seeding covers nodes ∪ edge endpoints: an endpoint that is missing
  * from the node frame still participates with its own id as a label
  * (it can be the component minimum and it can bridge a chain), so the
  * per-round id set is CLOSED — messages only flow to seeded ids —
  * which is what makes the strict-decrease convergence check complete.
  *
  * Scale posture per round: one equi-join of the (symmetrized) edge list
  * against the label table on the node id + one min-aggregate, both
  * hash-partitioned on node id — no broadcast of anything
  * corpus-sized, no driver-side graph. Each round is ONE Spark job:
  * the aggregate carries the node's previous label alongside the new
  * minimum (the self row is tagged before the union, so
  * `min(prev-tagged lbl)` IS the old label — the id set is closed by
  * seeding), and the changed-label count is taken from the same
  * materialization pass that caches the round's output — no separate
  * next-vs-prev join job, which at tiny per-round data would double the
  * driver/scheduling cost that dominates, and at 100 TB would double
  * the number of passes over the label table. Each round's labels are
  * materialized as a persisted RDD wrapped back into a leaf DataFrame:
  * Catalyst sees a scan, not round-N's full lineage (whose analysis
  * cost would grow linearly with rounds — the edge list alone drags the
  * whole LSH candidate pipeline into every plan), and the previous
  * round's blocks are unpersisted DETERMINISTICALLY as soon as the next
  * round is materialized — executor storage holds at most two label
  * snapshots regardless of round count (localCheckpoint would truncate
  * lineage too, but frees its blocks only when the GC/ContextCleaner
  * gets around to it).
  */
object Components {

  /** @param nodes one row per node (extra columns ignored); endpoints
    *              appearing only in `edges` are seeded automatically
    * @param idCol  node id column in `nodes` (numeric)
    * @param edges  undirected edge list, one row per edge
    * @param aCol   edge endpoint column in `edges`
    * @param bCol   other endpoint column in `edges`
    * @param maxIter hard cap on propagation rounds (diameter bound);
    *                reaching it without a fixpoint throws — silently
    *                returning partially-propagated labels would hand
    *                the caller wrong cluster ids
    * @return (idCol, cluster_id) — cluster_id = min node id reachable
    */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession

    // Eagerly compute `df` into a persisted RDD and wrap it back into a
    // leaf DataFrame: truncated lineage for Catalyst, deterministic
    // block release for us. The label/edge rows are a few longs each —
    // the Row round-trip is noise next to a per-round shuffle.
    def materialize(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd.count()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    val e = edges.select(col(aCol).cast("long").as("src"),
      col(bCol).cast("long").as("dst"))
    // Symmetrize once and keep the (tiny relative to the corpus) edge
    // list materialized across rounds instead of re-deriving it from
    // the candidate-generation pipeline every iteration.
    val (sym, symRdd) = materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))))
    var (labels, labelsRdd) = materialize(
      nodes.select(col(idCol).cast("long").as("id"))
        .union(sym.select(col("src").as("id")))
        .distinct()
        .withColumn("lbl", col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; a node's new label is the min
      // of its own and everything it heard
      val msgs = sym.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      // Tag the self row's label as `prev` before the union: seeding
      // closed the id set, so every id has exactly one self row and
      // min(prev) recovers the old label in the SAME aggregate that
      // computes the new one — the convergence check rides along
      // instead of costing a second join + pass over the labels.
      val nextDf = labels.select(col("id"), col("lbl"), col("lbl").as("prev"))
        .union(msgs.select(col("id"), col("lbl"), lit(null).cast("long").as("prev")))
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"), min(col("prev")).as("prev"))
      // One action materializes the round AND counts strict decreases
      // ("changed"): labels only ever shrink, so lbl < prev iff the
      // node heard a smaller label this round.
      val nextRdd = nextDf.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      val changed = nextRdd.mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { val r = it.next(); if (r.getLong(1) < r.getLong(2)) n += 1 }
        Iterator.single(n)
      }.sum().toLong
      labelsRdd.unpersist(blocking = false)
      labels = spark.createDataFrame(nextRdd, nextDf.schema)
        .select(col("id"), col("lbl"))
      labelsRdd = nextRdd
      converged = changed == 0
      iter += 1
    }
    symRdd.unpersist(blocking = false)
    // one INFO line per invocation: rounds ≈ graph diameter — the
    // number to watch if cluster chains ever lengthen (pointer-jumping
    // halves rounds but doubles per-round joins; it only pays past
    // ~6-8 rounds, see PLANS.md round-7 note)
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"connectedComponents converged in $iter rounds")
    if (!converged) {
      labelsRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "raise maxIter (rounds needed = graph diameter)")
    }
    labels.select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }
}
