package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ST1/ST5/ST6 against an in-memory stream (the reference's stream SPI
  * with sync() pulls — EventStream.java:7-17). */
case class Ev(_collection: String, uuid: String, ts: java.sql.Timestamp,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(1_700_000_000_000L + s * 1000)

  test("ST1: subscription filter + projection, incremental sync") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val stream = mem.toDF().toDF("_collection", "event_type", "value")
    val sub = StreamSubscription("s1",
      Seq(CollectionStreamQuery("pageview", Some("value > 10.0"))),
      columns = Seq("_collection", "value"))
    val planned = Subscriptions.plan(stream, sub)

    mem.addData(("pageview", "click", 5.0), ("pageview", "click", 25.0),
      ("checkout", "click", 99.0))
    val q = Subscriptions.syncOnce(planned, "sub_out")
    val batch1 = spark.table("sub_out").collect()
    assert(batch1.map(_.getDouble(1)).toSeq == Seq(25.0)) // filter + projection applied
    assert(batch1.head.schema.fieldNames.toSeq == Seq("_collection", "value"))

    mem.addData(("pageview", "view", 50.0))
    q.processAllAvailable() // second sync() pull
    assert(spark.table("sub_out").count() == 2)
    q.stop()
  }

  test("ST5: session_window closes per-user sessions on the 30-min gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val sessions = Subscriptions.sessionAgg(
      mem.toDF().toDF("ts", "user"), "ts", "user",
      gap = "30 minutes", delay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      // u1: two events 10 min apart (one session), then one 2 h later
      // (new session); u2: a single event
      mem.addData((t(0), "u1"), (t(600), "u1"), (t(7800), "u1"), (t(0), "u2"))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .selectExpr("user", "n_events", "session_start", "session_end")
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
        .sortBy(x => (x._1, x._3))
      assert(rows.map(r => (r._1, r._2)).toSeq ==
        Seq(("u1", 2L), ("u1", 1L), ("u2", 1L)))
      // first u1 session spans the 10-min pair; second is the lone event
      assert(rows(0)._4 - rows(0)._3 == 600000L)
      assert(rows(1)._3 == t(7800).getTime)
    } finally q.stop()
  }

  test("ST6: dedup by uuid within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val deduped = Subscriptions.dedup(mem.toDF(), "uuid", "ts", "10 minutes")
    mem.addData(
      Ev("c", "id1", t(0), "click", 1.0),
      Ev("c", "id1", t(1), "click", 1.0), // duplicate delivery
      Ev("c", "id2", t(2), "view", 2.0))
    val q = Subscriptions.syncOnce(deduped, "dedup_out")
    assert(spark.table("dedup_out").count() == 2)
    q.stop()
  }

  test("ST5: streaming windowed counts equal batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev("c", "a", t(0), "click", 1.0), Ev("c", "b", t(30), "click", 2.0),
      Ev("c", "c", t(90), "view", 3.0), Ev("c", "d", t(3700), "click", 4.0))
    mem.addData(events: _*)
    val agg = Subscriptions.windowedCounts(mem.toDF(), "ts", "event_type",
      "1 minute", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streaming = spark.table("win_out")
      .select($"window.start", $"event_type", $"n_events", $"sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = events.toDF()
      .groupBy(window($"ts", "1 minute"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .select($"window.start", $"event_type", $"n", $"s")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streaming == batch)
    q.stop()
  }
}
