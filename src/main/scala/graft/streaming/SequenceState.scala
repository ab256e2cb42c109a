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

/** Per-user state for the session-scoped variant: the current
  * session's last ≤C types, the newest event time (both the session
  * gap's reference point and the idle-expiry clock), and the 1-based
  * session index. */
final case class SeqSessionHistory(types: List[String], lastMs: Long,
    sessionIdx: Long)

/** One emitted session-scoped example — identical shape to a batch
  * sq3 row. */
final case class SeqSessionExample(user_id: Long, session_idx: Long,
    event_id: Long, label: String, context: Seq[String], n_context: Int)

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

  /** The session-scoped twin of [[examples]] — batch sq3 run
    * continuously: the context window RESETS whenever a user's gap
    * exceeds [[graft.analytics.BehavioralQueries.SessionGapMinutes]]
    * (the ONE boundary rule, imported as a constant so the two engines
    * cannot be retuned apart), and every example carries its 1-based
    * session index. On in-order replay with no state expiry the output
    * is row-identical to `sq3From` (SequenceStateSpec pins a replay
    * whose session gap straddles a micro-batch boundary). After an
    * idle expiry the session NUMBERING restarts at 1 — the history a
    * batch recount would extend is deliberately gone; the context
    * semantics are unaffected because any expiry-length gap is also a
    * session break. */
  def sessionExamples(events: Dataset[SeqEvent],
      c: Int = graft.analytics.SequenceQueries.C,
      idleMs: Long = 24L * 3600 * 1000,
      delay: String = "0 seconds"): Dataset[SeqSessionExample] = {
    import events.sparkSession.implicits._
    val gapMs =
      graft.analytics.BehavioralQueries.SessionGapMinutes * 60L * 1000L
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqSessionHistory, SeqSessionExample](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SeqEvent],
            state: GroupState[SeqSessionHistory]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var h = state.getOption.getOrElse(SeqSessionHistory(Nil, 0L, 0L))
            val out = Seq.newBuilder[SeqSessionExample]
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              // the batch rule verbatim: strictly-greater-than gap (an
              // exactly-30-minute pause stays in session), measured
              // against the PREVIOUS event's time
              if (h.sessionIdx == 0L || e.ts.getTime > h.lastMs + gapMs)
                h = SeqSessionHistory(Nil, h.lastMs, h.sessionIdx + 1)
              if (h.types.nonEmpty)
                out += SeqSessionExample(uid, h.sessionIdx, e.event_id,
                  e.event_type, h.types, h.types.size)
              h = SeqSessionHistory((h.types :+ e.event_type).takeRight(c),
                math.max(h.lastMs, e.ts.getTime), h.sessionIdx)
            }
            state.update(h)
            state.setTimeoutTimestamp(math.max(h.lastMs + idleMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
