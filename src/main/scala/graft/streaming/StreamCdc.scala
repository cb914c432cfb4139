package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC state view — ops/Cdc's latest-change-per-key collapse
  * maintained INCREMENTALLY over an unbounded change stream
  * (`mapGroupsWithState`): each micro-batch folds its changes into a
  * one-record-per-key state and re-emits the key's current row, so
  * downstream sees a live SCD1 dimension instead of re-collapsing the
  * whole log per trigger (the same recompute-vs-maintain upgrade
  * StreamRollup makes for the daily rollup).
  *
  * Contract mirrors the batch op: `seq` must totally order a key's
  * changes (ties are nondeterministic — same as Cdc.applyLatest's
  * ordering requirement); a key whose latest change is a delete is
  * EMITTED with its op so consumers can tombstone it — filtering
  * `op != "D"` yields exactly the batch `applyLatest` view
  * (StreamCdcSpec proves row equality on the same log).
  *
  * Scale posture: state is ONE record per live key, hash-partitioned
  * on the key — no log retention in the store, no per-batch shuffle of
  * history. Update output mode: only keys touched by a batch re-emit.
  */
object StreamCdc {

  final case class Change(key: Long, seq: Long, op: String, payload: Double)
  final case class CdcState(seq: Long, op: String, payload: Double, n: Long)
  final case class Latest(
      key: Long, seq: Long, op: String, payload: Double, n_changes: Long)

  def latestState(changes: Dataset[Change]): Dataset[Latest] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .mapGroupsWithState[CdcState, Latest](GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Change], state: GroupState[CdcState]) =>
          var s = state.getOption.getOrElse(
            CdcState(Long.MinValue, "", 0.0, 0L))
          it.foreach { c =>
            // n == 0 marks the empty state — no sentinel comparison, so
            // a change carrying seq == Long.MinValue still applies
            s =
              if (s.n == 0L || c.seq > s.seq)
                CdcState(c.seq, c.op, c.payload, s.n + 1)
              else s.copy(n = s.n + 1)
          }
          state.update(s)
          Latest(key, s.seq, s.op, s.payload, s.n)
      }
  }
}
