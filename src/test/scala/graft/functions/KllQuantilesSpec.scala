package graft.functions

import graft.SparkSpec
import graft.functions.KllQuantiles._
import org.apache.spark.sql.functions._

/** The KLL aggregate's contract: estimates respect the published
  * normalized-rank error bound through the full distributed path
  * (partial update → shuffle serialize → merge → eval), merging
  * per-batch sketches keeps the bound (the MV refresh path), and the
  * empty sketch reads as NULL, not a fabricated number. KLL compaction
  * is randomized, so the BOUND is the contract — never bit-equality of
  * estimates. */
class KllQuantilesSpec extends SparkSpec {

  private val eps = 2 * rankError(200)

  test("grouped sketch estimates land within the rank-error bound of exact") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val df = (1 to 20000).map(i =>
      (s"g${i % 3}", rng.nextGaussian() * (i % 3 + 1))).toDF("g", "v")
      .repartition(7)
    val got = df.groupBy($"g")
      .agg(kllSketchAgg($"v").as("sk"),
        expr(s"percentile(v, ${0.5 - eps})").as("lo"),
        expr(s"percentile(v, ${0.5 + eps})").as("hi"))
      .select($"g", kllQuantile($"sk", 0.5).as("est"), $"lo", $"hi")
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) && r.getDouble(1) <= r.getDouble(3),
        s"${r.getString(0)}: p50 estimate ${r.getDouble(1)} outside " +
          s"[${r.getDouble(2)}, ${r.getDouble(3)}]")
    }
  }

  test("merged per-batch sketches keep the bound (the MV refresh path)") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val all = (1 to 30000).map(_ => rng.nextDouble() * 100)
    val batches = all.grouped(7000).toSeq
    val sketches = batches.zipWithIndex.map { case (b, i) =>
      b.toDF("v").agg(kllSketchAgg($"v").as("sk")).withColumn("b", lit(i))
    }.reduce(_.unionByName(_))
    val merged = sketches.agg(kllMergeAgg($"sk").as("sk"))
      .select(kllQuantile($"sk", 0.9).as("est")).collect()(0).getDouble(0)
    val exact = all.toDF("v")
      .agg(expr(s"percentile(v, ${0.9 - eps})"), expr(s"percentile(v, ${0.9 + eps})"))
      .collect()(0)
    assert(merged >= exact.getDouble(0) && merged <= exact.getDouble(1),
      s"merged p90 $merged outside [${exact.getDouble(0)}, ${exact.getDouble(1)}]")
  }

  test("all-null input yields an empty sketch; kll_quantile reads NULL") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, None).toDF("v")
    val out = df.agg(kllSketchAgg($"v").as("sk"))
      .select(kllQuantile($"sk", 0.5)).collect()(0)
    assert(out.isNullAt(0), "empty sketch must serve NULL quantiles")
  }

  test("quantile-state MV refreshes from deltas and stays in bound") {
    import graft.store.MaterializedView
    val ev = graft.Tables(spark, sf("sf0.001"), "events")
    val mv = new MaterializedView(Seq("event_type"), Nil, Nil, Seq("value"))
    val served = mv.result(mv.merge(
      mv.partial(ev.filter(dayofmonth(col("ts")) <= 10)),
      mv.partial(ev.filter(dayofmonth(col("ts")) > 10 &&
        dayofmonth(col("ts")) <= 20)),
      mv.partial(ev.filter(dayofmonth(col("ts")) > 20))))
    val exact = ev.groupBy(col("event_type")).agg(
      expr(s"percentile(value, ${0.5 - eps})").as("lo"),
      expr(s"percentile(value, ${0.5 + eps})").as("hi"))
    val rows = served.join(exact, Seq("event_type")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("approx_p50_value")
      assert(est >= r.getAs[Double]("lo") && est <= r.getAs[Double]("hi"),
        s"${r.getAs[String]("event_type")}: 3-delta refresh broke the bound")
    }
  }
}
