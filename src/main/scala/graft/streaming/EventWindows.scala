package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2h beyond the reference: event-time streaming semantics.
  *
  * The reference has NO watermarks, event-time windows, or stateful
  * operators — its daily rollup is a processing-time 1-day tumbling
  * window re-materialized per file event, and late data is silently
  * mis-dated (SURVEY.md §2h). These operators are the event-time-correct
  * forms a production deployment would add on the same event stream:
  *
  *  - [[windowedStats]]: tumbling event-time windows with a watermark —
  *    bounded state, deterministic late-data cutoff, windows finalized
  *    exactly once in append mode;
  *  - [[sessionize]]: gap-based sessions via `flatMapGroupsWithState`
  *    with event-time timeout — the custom-state shape
  *    (KeyValueGroupedDataset) for semantics no built-in window covers.
  *
  * Scale posture: state is keyed (event_type / user_id) and shuffled on
  * the key; the watermark bounds state size by construction. No driver
  * state, no unbounded buffers.
  */
object EventWindows {

  /** Tumbling event-time aggregate over the `events` stream shape
    * (`ts` timestamp, `event_type`, `value`).
    */
  def windowedStats(
      events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)
  final case class SessionState(
      startMs: Long, lastMs: Long, n: Int, total: Double)

  /** Gap-based sessionization: a user's session closes when no event
    * arrives within `gapMs` of the last one — detected within a batch
    * directly, across batches via event-time timeout (fires when the
    * watermark passes last + gap).
    */
  def sessionize(
      events: Dataset[SessionEvent], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def close(user: Long, s: SessionState): Session =
      Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.total)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(user, s))
          } else {
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.total + e.value))
                case Some(s) => // in-batch gap: close and start fresh
                  closed += close(user, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
