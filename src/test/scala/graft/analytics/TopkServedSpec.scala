package graft.analytics

import graft.{SparkSpec, Tables}

/** The sketch-served top-k's operating envelope: its candidate heads
  * come from PER-PARTITION lossy-counting summaries, so the contract —
  * k ranks per language, CMS bounds holding for every served gram —
  * must survive any physical layout of the input, and the served set
  * must actually FIND the heavy hitters (high recall vs the exact
  * top-k) rather than merely satisfy bounds on arbitrary grams. */
class TopkServedSpec extends SparkSpec {

  private def docs = Tables(spark, sf("sf0.001"), "documents")

  private def contract(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L),
        s"$lang: served ranks are not exactly 1..10")
      assert(rs.forall(_.getBoolean(2)), s"$lang: CMS undercounted a gram")
      assert(rs.forall(_.getBoolean(3)), s"$lang: CMS above the eps bound")
    }
    assert(byLang.nonEmpty)
  }

  test("served contract holds under repartitioned inputs (1, 3, 17)") {
    for (n <- Seq(1, 3, 17))
      contract(TextQueries.tTopkServedFrom(docs.repartition(n)))
  }

  test("every served gram is genuinely heavy: true count within sketch " +
    "error of the exact top-10 cut") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val counted = TextQueries.gramsOfDocs(docs)
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("n"))
    val exactCounts = counted.collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val served = TextQueries.servedTopk(docs).collect()
    assert(served.nonEmpty)
    served.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val counts = exactCounts(lang)
      // the exact 10th-highest count is the cut; a served gram may miss
      // the exact set only within the CMS overestimate margin
      val cut = counts.values.toSeq.sorted(Ordering[Long].reverse)
        .take(10).last
      val slack = math.ceil(
        TextQueries.ServedCmsEps * counts.values.sum).toLong
      rs.foreach { r =>
        val g = r.getString(1)
        assert(counts(g) >= cut - slack,
          s"$lang: served gram '$g' (true ${counts(g)}) far below the " +
            s"top-10 cut $cut (slack $slack)")
      }
    }
  }
}
