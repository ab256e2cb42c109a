package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on a user's journey (the streaming twin of the batch A6
  * funnel input). */
final case class FunnelEvent(user: String, ts: java.sql.Timestamp,
    event_type: String)

/** In-flight progress for one user: how many ordered steps matched, and
  * the funnel's start / latest event times. This IS the operator state —
  * one small record per active user, freed on completion or timeout. */
final case class FunnelProgress(step: Int, startMs: Long, lastMs: Long)

/** Emitted once per finished journey: completed (all steps in window)
  * or expired (event-time timeout with `steps_reached` < all). */
final case class FunnelResult(user: String, completed: Boolean,
    steps_reached: Int, start_ms: Long, last_ms: Long)

/** ST-state: streaming funnel tracking with explicit custom state —
  * the case the built-in windows cannot express: "emit the moment a
  * user finishes `steps` IN ORDER within `windowMs`, or report how far
  * they got when the window expires."
  *
  * `flatMapGroupsWithState` keeps exactly one [[FunnelProgress]] per
  * in-flight user in the state store; completion and event-time timeout
  * both clear it, so state size is bounded by *concurrently active*
  * journeys — not by history — and the watermark drives expiry exactly
  * like the reference's continuous-query state (SURVEY.md §2.9).
  * Batch parity: on a static Dataset the same fold (sorted per user)
  * yields A6's per-step counts — asserted in FunnelStateSpec. */
object FunnelState {

  def track(events: Dataset[FunnelEvent], steps: Seq[String],
      windowMs: Long, delay: String = "0 seconds"): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user)
      .flatMapGroupsWithState[FunnelProgress, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: String, evs: Iterator[FunnelEvent],
            state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            val p = state.get
            state.remove()
            Iterator.single(
              FunnelResult(user, completed = false, p.step, p.startMs, p.lastMs))
          } else {
            // Micro-batches are unordered; the fold is over event time.
            var p = state.getOption.getOrElse(FunnelProgress(0, 0L, 0L))
            val out = Seq.newBuilder[FunnelResult]
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val ms = e.ts.getTime
              if (p.step == 0) {
                if (e.event_type == steps.head)
                  p = FunnelProgress(1, ms, ms)
              } else if (e.event_type == steps(p.step) &&
                  ms - p.startMs <= windowMs) {
                p = FunnelProgress(p.step + 1, p.startMs, ms)
                if (p.step == steps.size) {
                  out += FunnelResult(user, completed = true,
                    p.step, p.startMs, p.lastMs)
                  p = FunnelProgress(0, 0L, 0L) // ready for the next journey
                }
              }
            }
            if (p.step > 0) {
              state.update(p)
              // the deadline may already be behind the watermark (a
              // non-advancing event arrived after the window closed) —
              // Spark rejects a timeout below the watermark, so clamp
              // forward: the state then expires on the next batch
              state.setTimeoutTimestamp(
                math.max(p.startMs + windowMs,
                  state.getCurrentWatermarkMs() + 1))
            } else if (state.exists) {
              state.remove()
            }
            out.result().iterator
          }
      }
  }
}
