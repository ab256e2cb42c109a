package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ST2: commit-log replay — the events table re-read as a file-source
  * stream must reproduce batch results exactly (the "events visible to
  * streams as stored" contract, ST7). */
class ReplaySpec extends SparkSpec {

  // the commit-log dir: events materialized once, streamed as files
  private lazy val logDir: String = {
    val dir = graft.TempDirs.scratch("graft-log").toString
    Tables(spark, sf(), "events").write.mode("overwrite").parquet(dir)
    dir
  }

  test("file-source replay of events matches batch filter + projection") {
    val batchDf = spark.read.parquet(logDir)
    val stream = spark.readStream
      .schema(batchDf.schema)
      .parquet(logDir)
      .withColumn("_collection", col("event_type"))
    val sub = StreamSubscription("replay",
      Seq(CollectionStreamQuery("click", Some("value > 150.0"))),
      columns = Seq("event_id", "value"))
    val q = Subscriptions.syncOnce(Subscriptions.plan(stream, sub), "replay_out")

    val streamed = spark.table("replay_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = batchDf.filter(col("event_type") === "click" && col("value") > 150.0)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    q.stop()
  }

  test("streaming segmentation equals batch segmentation on replay") {
    // watermarks need TIMESTAMP (ltz) event time; NTZ is cast in UTC
    val batchDf = spark.read.parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val stream = spark.readStream.schema(spark.read.parquet(logDir).schema)
      .parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("seg_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("seg_out")
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[Any]("day").toString, r.getString(1), r.getLong(2))).toSet
    val batch = batchDf
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[Any]("day").toString, r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    q.stop()
  }

  test("streaming sessionization equals the batch session_window on " +
    "replay (and therefore the w2 islands, via SessionWindowSpec)") {
    val batchDf = spark.read.parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val stream = spark.readStream.schema(spark.read.parquet(logDir).schema)
      .parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = Subscriptions.sessionAgg(stream, "ts", "user_id",
      gap = "30 minutes", delay = "1 day")
      .writeStream.format("memory").queryName("sess_replay")
      .outputMode("complete").start()
    q.processAllAvailable()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getTimestamp(3).getTime)).toSet
    val streamed = canon(spark.table("sess_replay"))
    val batch = canon(batchDf
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end")))
    assert(streamed == batch && streamed.nonEmpty)
    q.stop()
  }

  test("a stream-maintained materialized view serves the full-history " +
    "aggregate after incremental appends") {
    import graft.store.MaterializedView
    val ev = spark.read.parquet(logDir)
    val streamDir = graft.TempDirs.scratch("graft-mv-in").toString
    val mvDir = graft.TempDirs.scratch("graft-mv-state").toString
    val ckpt = graft.TempDirs.scratch("graft-mv-ckpt").toString
    val mv = new MaterializedView(Seq("event_type"), Seq("value"))

    // first batch of the log arrives before the query starts
    ev.filter(dayofmonth(col("ts")) <= 10).write.mode("append").parquet(streamDir)
    val stream = spark.readStream.schema(ev.schema).parquet(streamDir)
    val q = mv.maintain(stream, mvDir).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // two more appends, each picked up as its own delta
      ev.filter(dayofmonth(col("ts")) > 10 && dayofmonth(col("ts")) <= 20)
        .write.mode("append").parquet(streamDir)
      q.processAllAvailable()
      ev.filter(dayofmonth(col("ts")) > 20).write.mode("append").parquet(streamDir)
      q.processAllAvailable()

      val served = mv.read(spark, mvDir).collect().map(_.toSeq).toSet
      val full = mv.result(mv.partial(ev)).collect().map(_.toSeq).toSet
      assert(served == full && full.nonEmpty)
    } finally q.stop()
  }

  test("streaming funnel completions equal the batch fold on replay") {
    import spark.implicits._
    val steps = Seq("view", "click", "purchase")
    val windowMs = 6L * 3600 * 1000
    val events = spark.readStream
      .schema(spark.read.parquet(logDir).schema)
      .parquet(logDir)
      .select(col("user_id").cast("string").as("user"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type"))
      .as[FunnelEvent]
    val q = FunnelState.track(events, steps, windowMs)
      .writeStream.format("memory").queryName("funnel_replay")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.table("funnel_replay")
      .filter(col("completed"))
      .select("user", "start_ms", "last_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // driver-side twin of the state fold over the same log (sf0.001 is
    // small enough to collect): identical machine, identical journeys
    val byUser = spark.read.parquet(logDir)
      .select(col("user_id").cast("string"), col("ts").cast("timestamp"),
        col("event_type"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2)))
      .groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      var step = 0; var start = 0L; var last = 0L
      val done = Seq.newBuilder[(String, Long, Long)]
      evs.sortBy(_._2).foreach { case (_, ms, et) =>
        if (step == 0) {
          if (et == steps.head) { step = 1; start = ms; last = ms }
        } else if (et == steps(step) && ms - start <= windowMs) {
          step += 1; last = ms
          if (step == steps.size) { done += ((u, start, last)); step = 0 }
        }
      }
      done.result()
    }.toSet
    assert(streamed == expected && streamed.nonEmpty)
    q.stop()
  }
}
