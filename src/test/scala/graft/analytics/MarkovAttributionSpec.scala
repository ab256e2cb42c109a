package graft.analytics

import graft.SparkSpec

/** a22 semantics on hand-computable journey sets: removal effects,
  * journey splitting at conversions, and the truncation contract. */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(1_700_000_000_000L + s * 1000)

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (u, id, s, ty) => (u, id, t(s), ty) }
      .toDF("user_id", "event_id", "ts", "event_type")

  test("a channel that always converts takes all the credit") {
    // u1: A → purchase; u2: B (dangling). Chain: START→{A: .5, B: .5},
    // A→CONV: 1. Base p = .5; removing A → 0 (effect 1); removing B
    // leaves A's path intact (effect 0).
    val d = ev(Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 10L, "purchase"),
      (2L, 3L, 0L, "B")))
    val rows = PathQueries.a22From(d).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (pBaseA, effA, attrA) = rows("A")
    val (_, effB, attrB) = rows("B")
    assert(pBaseA === 0.5)
    assert(effA === 1.0 && attrA === 1.0)
    assert(effB === 0.0 && attrB === 0.0)
  }

  test("journeys split at conversions: post-purchase events start fresh") {
    // one user: A → purchase → B. B belongs to a NEW journey (dangling),
    // so transitions are START→A, A→CONV, START→B — identical to the
    // two-user corpus above, and attribution must match it.
    val oneUser = ev(Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 10L, "purchase"), (1L, 3L, 20L, "B")))
    val twoUsers = ev(Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 10L, "purchase"),
      (2L, 3L, 0L, "B")))
    val a = PathQueries.a22From(oneUser).collect()
      .map(_.toSeq).toSet
    val b = PathQueries.a22From(twoUsers).collect()
      .map(_.toSeq).toSet
    assert(a === b)
  }

  test("api.Analytics.markovAttribution == registry a22 through renamed columns") {
    val d = graft.Tables(spark, sf(), "events")
    val reg = PathQueries.a22MarkovAttribution(spark, sf())
      .collect().map(_.toSeq).toSet
    val renamed = d.withColumnRenamed("user_id", "u")
      .withColumnRenamed("event_type", "t")
    val api = graft.api.Analytics.markovAttribution(
      renamed, "u", "ts", "event_id", "t", "purchase")
      .collect().map(_.toSeq).toSet
    assert(api === reg)
  }

  test("no reachable conversions → empty result, never NaN") {
    // a corpus with events but no purchase at all (mistyped conversion
    // name, or simply none yet)
    val d = ev(Seq((1L, 1L, 0L, "A"), (2L, 2L, 0L, "B")))
    assert(PathQueries.a22From(d).collect().isEmpty)
    // conversions that need no touchpoints: every channel's removal
    // effect is 0 → attribution 0, not 0/0
    val d2 = ev(Seq(
      (1L, 1L, 0L, "purchase"), (1L, 2L, 10L, "A"),
      (2L, 3L, 0L, "purchase")))
    val rows = PathQueries.a22From(d2).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    rows.foreach { case (eff, attr) =>
      assert(eff === 0.0 && attr === 0.0, rows.toSeq)
    }
  }

  test("reserved virtual-state names in event types fail loudly") {
    val d = ev(Seq((1L, 1L, 0L, "(conv)"), (1L, 2L, 10L, "purchase")))
    intercept[IllegalArgumentException] { PathQueries.a22From(d) }
  }

  test("a longer chain still converts within the truncation depth") {
    // A→B→C→purchase: 3 steps + absorption < MarkovSteps, so the
    // truncated probability is exact: p_base = 1, and removing any
    // link severs the only path (effect 1 each, attribution 1/3)
    val d = ev(Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 10L, "B"), (1L, 3L, 20L, "C"),
      (1L, 4L, 30L, "purchase")))
    val rows = PathQueries.a22From(d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set("A", "B", "C"))
    rows.values.foreach { case (eff, attr) =>
      assert(eff === 1.0)
      assert(math.abs(attr - 1.0 / 3) < 1e-9)
    }
  }
}
