package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dialogue/context assembly — the incremental twin of the
  * x107 batch operator: turn a per-user event stream into sliding
  * (context, target) training pairs AS EVENTS ARRIVE, instead of
  * re-sorting the whole log per trigger. State per user is a bounded
  * ring of the last `window` event types plus a sequence counter
  * (`flatMapGroupsWithState`, hash-partitioned on the user — the
  * StreamCdc maintain-vs-recompute upgrade applied to sequence
  * assembly).
  *
  * Ordering contract (mirrors StreamCdc's seq contract): a user's
  * events must arrive in (ts, event_id) order ACROSS micro-batches —
  * within a batch the group's iterator is sorted here, but state
  * cannot splice an earlier event in after a later one was folded. A
  * replayed/out-of-order feed is repaired by the batch x107 recompute
  * downstream, the same division of labor as StreamDedup vs x01.
  *
  * Scale posture: state is O(window) strings per ACTIVE user, the
  * emission is append-only (each event emits at most one pair), and
  * nothing corpus-sized shuffles beyond the user-keyed exchange every
  * stateful operator pays.
  */
object StreamContext {

  /** `ts` is an ISO-formatted timestamp string (lexicographic order =
    * chronological — the caller casts; keeps the state codec free of
    * timestamp-type concerns).
    */
  final case class Ev(
      user_id: Long, event_id: Long, ts: String, event_type: String)
  final case class CtxState(seq: Long, recent: Seq[String])
  final case class CtxPair(
      user_id: Long, seq: Long, event_id: Long,
      context: String, target: String)

  def contextPairs(
      events: Dataset[Ev], window: Int = 4): Dataset[CtxPair] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CtxState, CtxPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[CtxState]) =>
          var s = state.getOption.getOrElse(CtxState(0L, Nil))
          val out = Seq.newBuilder[CtxPair]
          it.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
            val seq = s.seq + 1
            if (seq >= 2)
              out += CtxPair(user, seq, e.event_id,
                s.recent.mkString(" "), e.event_type)
            s = CtxState(seq, (s.recent :+ e.event_type).takeRight(window))
          }
          state.update(s)
          out.result().iterator
      }
  }
}
