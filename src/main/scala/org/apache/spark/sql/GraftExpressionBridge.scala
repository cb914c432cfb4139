package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for graft's native expressions.
  * Spark 4 made the conversion `private[sql]` (`classic.ExpressionUtils`),
  * so this one-liner lives in the `org.apache.spark.sql` package — the
  * standard pattern for libraries shipping custom expressions without a
  * session extension.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `localCheckpoint()` + exact row count in ONE Spark job (round-17,
  * the r16 verdict's "fuse per-query eager construction jobs" item):
  * `Dataset.localCheckpoint(eager = true)` materializes by running a
  * count whose value it throws away, so callers that need the corpus
  * size (the `corpusK(base.count())` deployment-sizing sites) paid a
  * second job to re-count the cached partitions. This does what
  * Dataset.localCheckpoint does — copy the internal rows, persist,
  * mark for local checkpointing, materialize with `count()` — and
  * returns that count. Lives in `org.apache.spark.sql` because
  * rebuilding the DataFrame over the materialized RDD needs
  * `private[sql] internalCreateDataFrame`.
  */
object GraftCheckpoint {
  def checkpointWithCount(df: DataFrame): (DataFrame, Long) = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.localCheckpoint()
    val n = rdd.count()
    // LogicalRDD.fromDataset, not internalCreateDataFrame: the latter
    // builds a stats-less leaf (defaultSizeInBytes = huge), which
    // silently demoted every downstream broadcast of the checkpointed
    // corpus to a sort-merge join (measured: x73 2 BroadcastHashJoin →
    // 2 SortMergeJoin, +0.5 s). fromDataset keeps the origin plan's
    // stats and ordering exactly like Dataset.localCheckpoint does.
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val out = classic.Dataset.ofRows(
      ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        rdd, ds, isStreaming = false))
    (out, n)
  }
}

/** Registers [[graft.GraftExtensions]]' SQL functions on an ALREADY
  * BUILT session — the path for sessions the library did not construct
  * (a harness hands query closures a bare session). `sessionState` is
  * `private[sql]`, hence this lives beside the bridge. Idempotent.
  */
object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    _root_.graft.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
      }
    }
}
