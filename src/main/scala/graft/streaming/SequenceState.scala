package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on a user's timeline (the streaming twin of the batch sq1
  * input — [[graft.analytics.SequenceQueries.sq1From]]). */
final case class SeqEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, event_type: String)

/** Per-user operator state: the last ≤C event types in chronological
  * order, plus the newest event time (drives idle expiry). */
final case class SeqHistory(types: List[String], lastMs: Long)

/** One emitted training example — identical shape to a batch sq1 row. */
final case class SeqExample(user_id: Long, event_id: Long, label: String,
    context: Seq[String], n_context: Int)

/** ST-state: next-event training examples maintained CONTINUOUSLY — the
  * streaming twin of sq1, for the pipeline that feeds a sequential
  * model from the live event stream instead of nightly batch jobs.
  *
  * `flatMapGroupsWithState` holds one [[SeqHistory]] (≤C strings) per
  * active user; each arriving event first emits its example against the
  * current history, then appends itself and trims to C — exactly the
  * batch window's `rowsBetween(-C, -1)` semantics. Micro-batches are
  * unordered, so the in-batch fold sorts by (ts, event_id), the same
  * total order the batch twin's window uses; parity on in-order replay
  * is pinned in SequenceStateSpec. State is bounded by *active* users:
  * an idle user's history expires `idleMs` after their newest event
  * (event-time timeout against the watermark), matching the operational
  * truth that a context window straddling a long gap is stale anyway. */
object SequenceState {

  def examples(events: Dataset[SeqEvent],
      c: Int = graft.analytics.SequenceQueries.C,
      idleMs: Long = 24L * 3600 * 1000,
      delay: String = "0 seconds"): Dataset[SeqExample] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqHistory, SeqExample](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SeqEvent], state: GroupState[SeqHistory]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var h = state.getOption.getOrElse(SeqHistory(Nil, 0L))
            val out = Seq.newBuilder[SeqExample]
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (h.types.nonEmpty)
                out += SeqExample(uid, e.event_id, e.event_type,
                  h.types, h.types.size)
              h = SeqHistory((h.types :+ e.event_type).takeRight(c),
                math.max(h.lastMs, e.ts.getTime))
            }
            state.update(h)
            // the idle deadline may sit behind the watermark when this
            // batch's events were themselves late — clamp forward so
            // Spark accepts it; the state then expires next batch
            state.setTimeoutTimestamp(math.max(h.lastMs + idleMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
