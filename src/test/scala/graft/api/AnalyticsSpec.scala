package graft.api

import graft.{SparkSpec, Tables}
import graft.analytics.{BehavioralQueries, CoreQueries, WindowQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The parameterized facade must reproduce the oracle-proven registry
  * shapes when instantiated with the test corpus's parameters — parity
  * here means every facade call inherits the DuckDB verification. */
class AnalyticsSpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val events = Tables(spark, sf(), "events")

  test("funnel(view,click,purchase) == oracle-proven a6") {
    val api = Analytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    assert(rows(api) == rows(BehavioralQueries.a6Funnel(spark, sf())))
  }

  test("retention(week) == oracle-proven a7") {
    val api = Analytics.retention(events, "user_id", "ts", "week")
      .withColumnRenamed("cohort_bucket", "cohort_week")
      .withColumnRenamed("offset", "week_offset")
    assert(rows(api) == rows(BehavioralQueries.a7Retention(spark, sf())))
  }

  test("sessionize(30 minutes) == oracle-proven w2") {
    val api = Analytics.sessionize(events, "user_id", "ts",
      gap = "30 minutes", tieBreak = Some("event_id"))
    assert(rows(api) == rows(BehavioralQueries.w2Sessionize(spark, sf())))
  }

  test("segmentation(day × event_type) == oracle-proven a4, sum included") {
    val api = Analytics.segmentation(events, "ts", "day",
      Seq("event_type"), valueCol = Some("value"))
      .withColumnRenamed("bucket", "day")
    val reg = CoreQueries.a4Segmentation(spark, sf())
    assert(api.count() == reg.count())
    // the facade doesn't compute n_users; every shared column —
    // including the decimal-funneled sum — must coincide exactly
    assert(rows(api.select("day", "event_type", "n_events", "sum_value")) ==
      rows(reg.select("day", "event_type", "n_events", "sum_value")))
  }

  test("topKPerGroup == oracle-proven w1 shape") {
    val api = Analytics.topKPerGroup(
      events.select("user_id", "event_id", "ts"), "user_id", 3,
      col("ts").desc, col("event_id").desc)
      .select("user_id", "event_id", "rank")
    val reg = WindowQueries.w1TopK(spark, sf())
      .select(col("user_id"), col("event_id"), col("rn").as("rank"))
    assert(rows(api) == rows(reg))
  }

  test("eventPaths == oracle-proven a14") {
    val api = Analytics.eventPaths(events,
      "user_id", "ts", "event_id", "event_type")
    assert(rows(api) ==
      rows(graft.analytics.PathQueries.a14EventPaths(spark, sf())))
  }

  test("pointInIntervalJoin matches a literal BETWEEN join, and rejects collisions") {
    import spark.implicits._
    val intervals = Seq(
      (1L, "2024-01-01 00:10:00", "2024-01-01 02:00:00"),
      (2L, "2024-01-01 03:00:00", "2024-01-01 03:30:00"))
      .toDF("ivl_id", "s", "e")
      .select($"ivl_id", $"s".cast("timestamp").as("start_ts"),
        $"e".cast("timestamp").as("end_ts"))
    val points = Seq(
      (10L, "2024-01-01 00:10:00"), // on the start boundary: inclusive
      (11L, "2024-01-01 01:59:59"),
      (12L, "2024-01-01 02:30:00"), // between intervals: no match
      (13L, "2024-01-01 03:30:00")) // on the end boundary: inclusive
      .toDF("p_id", "t")
      .select($"p_id", $"t".cast("timestamp").as("p_ts"))
    val got = Analytics.pointInIntervalJoin(
      points, intervals, "p_ts", "start_ts", "end_ts")
      .select("p_id", "ivl_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.crossJoin(intervals)
      .filter($"p_ts" >= $"start_ts" && $"p_ts" <= $"end_ts")
      .select("p_id", "ivl_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want == Set((10L, 1L), (11L, 1L), (13L, 2L)))
    // shared column names would make the residual ambiguous — rejected
    intercept[IllegalArgumentException] {
      Analytics.pointInIntervalJoin(
        points.withColumnRenamed("p_ts", "start_ts"),
        intervals, "start_ts", "start_ts", "end_ts")
    }
  }

  test("timeToConvert(view, purchase) == oracle-proven a19") {
    val api = Analytics.timeToConvert(Tables(spark, sf(), "events"),
      "user_id", "ts", "event_type", "view", "purchase")
    val reg = graft.analytics.BehavioralQueries
      .a19TimeToConvert(spark, sf())
    assert(rows(api) == rows(reg))
  }

  test("lastTouchAttribution(purchase, 7d) == oracle-proven a15") {
    val api = Analytics.lastTouchAttribution(events,
      "user_id", "ts", "event_id", "event_type", "value",
      conversionType = "purchase", windowDays = 7)
    assert(rows(api) ==
      rows(graft.analytics.PathQueries.a15Attribution(spark, sf())))
  }
}
