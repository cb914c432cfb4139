package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, HintInfo, Join, JoinHint, LogicalPlan, SHUFFLE_MERGE, Window}
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule automating the self-join exchange-reuse trick the
  * LSH operators apply by hand (`Dedup.nearDupPairs`' `hint("merge")`):
  *
  * When both sides of an un-hinted inner join are the SAME expensive
  * subtree (a self-join, e.g. banded-LSH candidate pairs), Catalyst's
  * default planning may broadcast one side — and a broadcast side does
  * NOT reuse the other side's shuffle, so the whole
  * tokenize→shingle→signature pipeline is computed twice. Forcing
  * shuffle-merge on both sides makes the two shuffle subtrees
  * identical, and `ReuseExchange` then computes the pipeline ONCE
  * (measured ~2× on the x02 shape).
  *
  * Fires only when:
  *  - the join is inner with no user hint (explicit hints win);
  *  - both children canonicalize identically (a true self-join); and
  *  - the shared subtree contains a Generate/Window/Aggregate —
  *    the recompute-expensive shapes. A cheap self-scan self-join is
  *    left alone: broadcasting a small scan is better than forcing a
  *    shuffle on both sides.
  *
  * Registered via `GraftExtensions` (`injectOptimizerRule`); runs in
  * the user-provided batch after core optimization, and the `Join.hint`
  * it sets is read by `JoinSelection` at physical planning.
  */
object PreferMergeForSelfJoins extends Rule[LogicalPlan] {

  private def expensive(plan: LogicalPlan): Boolean =
    plan.exists {
      case _: Generate | _: Window | _: Aggregate => true
      case _ => false
    }

  private val mergeBoth =
    JoinHint(Some(HintInfo(Some(SHUFFLE_MERGE))), Some(HintInfo(Some(SHUFFLE_MERGE))))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _: InnerLike, _, JoinHint.NONE)
        if left.canonicalized == right.canonicalized && expensive(left) =>
      j.copy(hint = mergeBoth)
  }
}
