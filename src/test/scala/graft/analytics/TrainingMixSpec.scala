package graft.analytics

import graft.SparkSpec

/** DS6 (temperature mixture) + T-BLOCKLIST behavioral contracts:
  * temperature scaling must actually FLATTEN the mix — both share
  * columns sum to 1 and α=0.5 up-weights every below-average source —
  * and the blocklist verdict must drop exactly the docs with ≥1 hit. */
class TrainingMixSpec extends SparkSpec {

  test("ds6: shares each sum to 1; sqrt-temperature up-weights small sources") {
    val rows = TrainingSetQueries.ds6Temperature(spark, sf("sf0.01"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 20)
    val rawSum = rows.map(_._3).sum
    val tempSum = rows.map(_._4).sum
    assert(math.abs(rawSum - 1.0) < 1e-9 && math.abs(tempSum - 1.0) < 1e-9,
      s"shares must normalize: raw=$rawSum temp=$tempSum")
    val meanTokens = rows.map(_._2).sum.toDouble / rows.length
    rows.foreach { case (src, n, _, _, boost) =>
      if (n < meanTokens * 0.95)
        assert(boost > 1.0, s"$src is below-average ($n tokens) but boost=$boost")
      if (n > meanTokens * 1.05)
        assert(boost < 1.0, s"$src is above-average ($n tokens) but boost=$boost")
    }
  }

  test("blocklist: drop_rate counts exactly the docs with >=1 hit in ANY class") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = TrainingSetQueries.tBlocklist(spark, sf("sf0.01"))
    // drop_rate is per-lang (identical across that lang's class rows)
    val perLang = out.select($"lang", $"drop_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perLang.nonEmpty)
    // recompute independently: a doc drops iff any blocklisted word occurs
    val docs = graft.Tables(spark, sf("sf0.01"), "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("hit", expr(
        "size(filter(toks, t -> t IN ('slow','dup','fast','big','small'))) > 0"))
      .groupBy($"lang")
      .agg((sum(when($"hit", 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("expect"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(perLang == docs, s"got $perLang, expected $docs")
  }
}
