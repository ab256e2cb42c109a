package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming next-event examples ≡ the oracle-proven batch sq1 on
  * in-order replay, across any micro-batch slicing; idle users' state
  * expires. */
class SequenceStateSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(1_700_000_000_000L + s * 1000)

  private def batchExamples(evs: Seq[SeqEvent]) = {
    val df = evs.toDF()
    graft.analytics.SequenceQueries.sq1From(df)
      .select($"user_id", $"event_id", $"label", $"context", $"n_context")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3).toList, r.getInt(4)))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  private def streamExamples(batches: Seq[Seq[SeqEvent]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = SequenceState.examples(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[SeqExample].collect()
        .map(e => (e.user_id, e.event_id, e.label, e.context.toList,
          e.n_context))
        .sortBy(x => (x._1, x._2)).toSeq
    } finally q.stop()
  }

  private val journey = Seq(
    SeqEvent(1L, 1L, t(0), "view"), SeqEvent(1L, 2L, t(10), "click"),
    SeqEvent(1L, 3L, t(20), "view"), SeqEvent(1L, 4L, t(30), "purchase"),
    SeqEvent(1L, 5L, t(40), "view"), SeqEvent(1L, 6L, t(50), "error"),
    SeqEvent(1L, 7L, t(60), "click"), SeqEvent(2L, 8L, t(5), "signup"),
    SeqEvent(2L, 9L, t(15), "view"))

  test("one batch: streaming examples == batch sq1") {
    assert(streamExamples(Seq(journey), "seq_one") === batchExamples(journey))
  }

  test("replayed in-order across three micro-batches: identical output") {
    // in-order replay = GLOBAL event-time order across batches (the
    // commit-log contract); a slicing that interleaves old events into
    // later batches puts them behind the watermark, and the operator
    // rightly drops them
    val ordered = journey.sortBy(e => (e.ts.getTime, e.event_id))
    val sliced = Seq(ordered.take(3), ordered.slice(3, 6), ordered.drop(6))
    assert(streamExamples(sliced, "seq_three") === batchExamples(journey))
  }

  test("context trims to the last 5 types, matching the batch window") {
    val exs = streamExamples(Seq(journey), "seq_trim")
    val last = exs.find(_._2 == 7L).get
    assert(last._4 === List("click", "view", "purchase", "view", "error"))
    assert(last._5 === 5)
  }

  private def batchSessionExamples(evs: Seq[SeqEvent]) = {
    val df = evs.toDF()
    graft.analytics.SequenceQueries.sq3From(df)
      .select($"user_id", $"session_idx", $"event_id", $"label",
        $"context", $"n_context")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getSeq[String](4).toList, r.getInt(5)))
      .sortBy(x => (x._1, x._3)).toSeq
  }

  private def streamSessionExamples(batches: Seq[Seq[SeqEvent]],
      name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = SequenceState.sessionExamples(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[SeqSessionExample].collect()
        .map(e => (e.user_id, e.session_idx, e.event_id, e.label,
          e.context.toList, e.n_context))
        .sortBy(x => (x._1, x._3)).toSeq
    } finally q.stop()
  }

  // a journey with a >30-minute gap (events 3→4) and an exactly-30-minute
  // pause (events 5→6, which must NOT break the session), plus a second
  // user interleaved
  private val gapped = {
    val m = 60L
    Seq(
      SeqEvent(1L, 1L, t(0), "view"), SeqEvent(1L, 2L, t(60), "click"),
      SeqEvent(1L, 3L, t(120), "view"),
      SeqEvent(1L, 4L, t(120 + 31 * m), "purchase"),
      SeqEvent(1L, 5L, t(120 + 32 * m), "view"),
      SeqEvent(1L, 6L, t(120 + 62 * m), "click"),
      SeqEvent(2L, 7L, t(30), "signup"),
      SeqEvent(2L, 8L, t(30 + 40 * m), "view"),
      SeqEvent(2L, 9L, t(40 + 40 * m), "purchase"))
  }

  test("session variant, one batch: streaming examples == batch sq3 " +
    "(gap resets, exact-30-minute pause does not)") {
    assert(streamSessionExamples(Seq(gapped), "sq3_one") ===
      batchSessionExamples(gapped))
  }

  test("session variant: a session gap straddling a micro-batch boundary " +
    "cannot diverge from the batch rule") {
    val ordered = gapped.sortBy(e => (e.ts.getTime, e.event_id))
    // slice exactly at the 31-minute gap: user 1's events 1-3 land in
    // batch one, event 4 (the session opener) in batch two
    val atGap = ordered.indexWhere(_.event_id == 4L)
    val sliced = Seq(ordered.take(atGap), ordered.drop(atGap))
    assert(streamSessionExamples(sliced, "sq3_straddle") ===
      batchSessionExamples(gapped))
    // and a three-way slicing that also splits the second user
    val three = Seq(ordered.take(2), ordered.slice(2, atGap + 1),
      ordered.drop(atGap + 1))
    assert(streamSessionExamples(three, "sq3_three") ===
      batchSessionExamples(gapped))
  }

  test("fuzz: random journeys × random micro-batch slicings stay " +
    "row-identical to batch sq3") {
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { round =>
      // 3 users, gaps drawn around the 30-minute boundary (some exactly
      // on it), event-time strictly increasing per user
      var id = 0L
      val evs = (1 to 3).flatMap { u =>
        var clock = rnd.nextInt(600).toLong
        (1 to 12 + rnd.nextInt(10)).map { _ =>
          id += 1
          clock += (rnd.nextInt(4) match {
            case 0 => rnd.nextInt(300).toLong          // in-session
            case 1 => 30L * 60                          // exactly the boundary
            case 2 => 30L * 60 + 1 + rnd.nextInt(600)   // break
            case _ => 1L + rnd.nextInt(60)
          })
          SeqEvent(u.toLong, id, t(clock),
            Seq("view", "click", "purchase", "error")(rnd.nextInt(4)))
        }
      }
      val ordered = evs.sortBy(e => (e.ts.getTime, e.event_id))
      // random in-order slicing into 1..5 micro-batches
      val cuts = (0 +: Seq.fill(rnd.nextInt(4))(rnd.nextInt(ordered.size))
        :+ ordered.size).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => ordered.slice(a, b) }
      assert(streamSessionExamples(batches, s"sq3_fuzz$round") ===
        batchSessionExamples(evs), s"round $round, cuts $cuts")
    }
  }

  test("an idle user's state expires and a later event starts fresh") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = SequenceState.examples(mem.toDS(), idleMs = 60 * 1000)
      .writeStream.format("memory").queryName("seq_idle")
      .outputMode("append").start()
    try {
      mem.addData(SeqEvent(9L, 1L, t(0), "view"))
      q.processAllAvailable()
      // another user's much-later event advances the watermark past
      // user 9's idle deadline; one more batch runs the timeout pass
      mem.addData(SeqEvent(8L, 2L, t(600), "click"))
      q.processAllAvailable()
      mem.addData(SeqEvent(8L, 3L, t(660), "click"))
      q.processAllAvailable()
      // user 9 returns: history was expired, so the first event back
      // has NO context — no example emitted for it
      mem.addData(SeqEvent(9L, 4L, t(700), "purchase"))
      q.processAllAvailable()
      val u9 = spark.table("seq_idle").as[SeqExample].collect()
        .filter(_.user_id == 9L)
      assert(u9.isEmpty, u9.toSeq)
    } finally q.stop()
  }
}
