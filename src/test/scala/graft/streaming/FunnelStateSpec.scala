package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Custom operator state via flatMapGroupsWithState: ordered-step
  * completion across micro-batches, in-window enforcement, and
  * event-time-timeout expiry that frees the per-user state. */
class FunnelStateSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private def t(s: Long) = new java.sql.Timestamp(1_700_000_000_000L + s * 1000)
  private def ev(u: String, s: Long, et: String) = FunnelEvent(u, t(s), et)

  test("completion emitted the moment the last in-order step arrives") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val out = FunnelState.track(mem.toDS(), steps, windowMs = 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // u1 progresses across two batches; u2 runs steps out of order
      mem.addData(ev("u1", 0, "view"), ev("u1", 60, "click"),
        ev("u2", 0, "click"), ev("u2", 60, "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").isEmpty) // nobody finished yet

      mem.addData(ev("u1", 120, "purchase"), ev("u2", 120, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out")
        .as[FunnelResult].collect().sortBy(_.user)
      // u1 completed; u2 never matched step order so nothing emitted
      assert(rows.map(_.user).toSeq == Seq("u1"))
      assert(rows.head.completed && rows.head.steps_reached == 3)
      assert(rows.head.start_ms == t(0).getTime &&
        rows.head.last_ms == t(120).getTime)
    } finally q.stop()
  }

  test("out-of-window step does not complete; timeout reports progress and frees state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val out = FunnelState.track(mem.toDS(), steps, windowMs = 600 * 1000)
    val q = out.writeStream.format("memory").queryName("funnel_to")
      .outputMode("append").start()
    try {
      mem.addData(ev("u3", 0, "view"), ev("u3", 60, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_to").isEmpty) // in flight, window open

      // purchase lands 20 min after start — outside the 10-min window,
      // so it must NOT complete; it advances the watermark past the
      // window, firing the event-time timeout (Spark may need one more
      // batch after the watermark update to run the timeout pass)
      mem.addData(ev("u3", 1200, "purchase"))
      q.processAllAvailable()
      mem.addData(ev("zz", 4000, "view"))
      q.processAllAvailable()
      val rows = spark.table("funnel_to").as[FunnelResult].collect()
      assert(rows.map(_.user).toSeq == Seq("u3"))
      assert(!rows.head.completed && rows.head.steps_reached == 2)
    } finally q.stop()
  }

  test("a non-advancing event after the window closed cannot kill the query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val out = FunnelState.track(mem.toDS(), steps, windowMs = 600 * 1000)
    val q = out.writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      mem.addData(ev("u9", 0, "view"))
      q.processAllAvailable()
      // another user's event drives the watermark far past u9's deadline
      mem.addData(ev("zz", 4000, "view"))
      q.processAllAvailable()
      // u9 sends a non-advancing event (out of window): the state's
      // deadline is now BEHIND the watermark — setting it verbatim
      // throws and kills the query; the clamp defers to watermark+1
      mem.addData(ev("u9", 4100, "purchase"))
      q.processAllAvailable()
      mem.addData(ev("zz", 4200, "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_late").as[FunnelResult].collect()
      assert(rows.exists(r => r.user == "u9" && !r.completed && r.steps_reached == 1))
    } finally q.stop()
  }

  test("batch parity: the same fold on a static dataset reproduces A6 step counts") {
    val events = Seq(
      // u1 completes; u2 stops at click; u3 only views; u4 wrong order
      ev("u1", 0, "view"), ev("u1", 10, "click"), ev("u1", 20, "purchase"),
      ev("u2", 0, "view"), ev("u2", 10, "click"),
      ev("u3", 0, "view"),
      ev("u4", 0, "purchase"), ev("u4", 10, "view")).toDS()
    // static twin of the state fold: furthest in-order step per user
    // (local copy so the closure doesn't drag the spec class along)
    val st = steps
    val reached = events.groupByKey(_.user).mapGroups { (u, evs) =>
      var step = 0
      evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
        if (step < st.size && e.event_type == st(step)) step += 1
      }
      (u, step)
    }.collect().toMap
    assert(reached == Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 1))
    // A6's funnel shape: users having reached step >= k
    val perStep = (1 to steps.size).map(k => reached.values.count(_ >= k))
    assert(perStep == Seq(4, 2, 1))
  }
}
