package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PreCalculateQuery contract: a streaming-maintained segmentation
  * table must equal the batch A4 result over the same data — after the
  * first batch AND after incremental updates. */
class PreAggregationSpec extends SparkSpec {

  private def canon(df: DataFrame): Set[(String, String, Long, Long)] =
    df.collect().map(r => (
      String.valueOf(r.getAs[java.sql.Timestamp]("day")),
      String.valueOf(r.getAs[String]("dimension")),
      r.getAs[Long]("n_events"),
      r.getAs[Long]("n_users"))).toSet

  test("materialized pre-aggregate equals batch segmentation, incrementally") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-preagg").toString
    val events = Tables(spark, sf(), "events")
      .select(
        lit("pageview").as("_collection"),
        $"ts".cast("timestamp").as("_time"),
        concat(lit("u"), $"user_id").as("_user"),
        $"event_type")

    // batch 1: first 60% of events
    val b1 = events.filter($"_time" < "2024-01-20")
    b1.write.mode("overwrite").parquet(s"$dir/in")

    val stream = Subscriptions.fileStream(spark, b1.schema, s"$dir/in")
    val pre = PreCalculateQuery(Some("pageview"), "event_type")
    val q = PreAggregation.materialize(
      PreAggregation.segmentation(stream, pre), "preagg_test")
    try {
      q.processAllAvailable()
      assert(canon(spark.table("preagg_test")) ==
        canon(PreAggregation.segmentation(b1, pre)))

      // batch 2 arrives: the table must fold it in incrementally
      events.filter($"_time" >= "2024-01-20")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      assert(canon(spark.table("preagg_test")) ==
        canon(PreAggregation.segmentation(events, pre)))
    } finally q.stop()
  }

  test("streaming ingest metrics equal the batch a3 shape, incrementally") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-a3s").toString
    val events = Tables(spark, sf(), "events")
      .select(
        $"event_type".as("_collection"),
        $"ts".cast("timestamp").as("_time"),
        concat(lit("u"), $"user_id").as("_user"),
        $"props".as("_payload"))
    def canonM(df: DataFrame) = df.collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

    val b1 = events.filter($"_time" < "2024-01-20")
    b1.write.mode("overwrite").parquet(s"$dir/in")
    val stream = Subscriptions.fileStream(spark, b1.schema, s"$dir/in")
    val q = PreAggregation.materialize(
      PreAggregation.ingestMetrics(stream), "a3_metrics_test")
    try {
      q.processAllAvailable()
      assert(canonM(spark.table("a3_metrics_test")) ==
        canonM(PreAggregation.ingestMetrics(b1)))
      // late batch folds in: counts, byte sums, and the span all move
      events.filter($"_time" >= "2024-01-20")
        .write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      assert(canonM(spark.table("a3_metrics_test")) ==
        canonM(PreAggregation.ingestMetrics(events)))
    } finally q.stop()
  }

  test("collection filter + approx variant stay within HLL error") {
    import spark.implicits._
    val events = Tables(spark, sf(), "events")
      .select(
        when($"event_id" % 2 === 0, "a").otherwise("b").as("_collection"),
        $"ts".cast("timestamp").as("_time"),
        concat(lit("u"), $"user_id").as("_user"),
        $"event_type")
    val pre = PreCalculateQuery(Some("a"), "event_type")
    val exact = PreAggregation.segmentation(events, pre)
    // only collection 'a' contributes
    assert(exact.agg(sum($"n_events")).head().getLong(0) ==
      events.filter($"_collection" === "a").count())
    val approx = PreAggregation.segmentation(events, pre, approx = true)
      .withColumnRenamed("n_users", "approx_users")
    val joined = exact.join(approx, Seq("day", "dimension"))
    val bad = joined.filter(
      abs($"approx_users" - $"n_users") > greatest($"n_users" * 0.1, lit(5.0)))
    assert(bad.count() == 0, "HLL estimate drifted beyond 10%")
  }
}
