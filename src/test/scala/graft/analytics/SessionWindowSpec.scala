package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** w8's native `session_window` must define exactly the same sessions
  * as the lag+cumsum island formulation (the oracle's definition):
  * break on gap > 30 min (inclusive close — an event exactly at
  * last_ts + gap merges), sessions summarized by (start, end, size). */
class SessionWindowSpec extends SparkSpec {

  test("session_window == island formulation at sf0.001") {
    import spark.implicits._
    val native = BehavioralQueries.w8SessionWindow(spark, sf())

    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val islands = graft.Tables(spark, sf(), "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("brk",
        when($"prev_ts".isNull ||
          $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"), max($"ts").as("session_end"))
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        (unix_micros($"session_end".cast("timestamp")) -
          unix_micros($"session_start".cast("timestamp"))).as("duration_us"))

    assert(native.count() == islands.count())
    assert(native.exceptAll(islands).isEmpty && islands.exceptAll(native).isEmpty)
  }

  test("boundary: exactly-30-min gap merges, >30 min splits") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
    val evs = Seq(
      (1L, base, 1L),
      (2L, base.plusMinutes(29), 1L),  // merges (< 30 min after prev)
      (3L, base.plusMinutes(59), 1L),  // exactly 30 min after #2 → still merges
      (4L, base.plusMinutes(90).plusSeconds(1), 1L)) // >30 min after #3 → splits
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", $"ts".cast("timestamp_ntz"))
    val sessions = evs
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect().sorted
    assert(sessions.toSeq == Seq(1L, 3L))
  }
}
