package graft.functions

import graft.SparkSpec
import graft.functions.ThetaSketches._
import org.apache.spark.sql.functions._

/** Theta set-algebra contracts: exact mode below k (the estimate IS
  * the count, through the full distributed agg→serialize→merge path),
  * intersection correctness on constructed sets, the 2σ bound in
  * estimation mode (beyond k), and union-merge (the MV refresh path). */
class ThetaSketchesSpec extends SparkSpec {

  test("exact mode: grouped estimates equal exact distinct counts below k") {
    import spark.implicits._
    val df = (1 to 9000).map(i => (s"g${i % 3}", (i % 997).toLong))
      .toDF("g", "u").repartition(7)
    val got = df.groupBy($"g")
      .agg(thetaSketchAgg($"u").as("sk"), countDistinct($"u").as("exact"))
      .select($"g", thetaEstimate($"sk").as("est"), $"exact")
      .collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getDouble(1) == r.getLong(2).toDouble,
      s"${r.getString(0)}: exact-mode sketch drifted"))
  }

  test("intersection of constructed sets is exact below k") {
    import spark.implicits._
    // A = 0..599, B = 300..899 → |A ∩ B| = 300
    val df = ((0L until 600L).map(("A", _)) ++ (300L until 900L).map(("B", _)))
      .toDF("s", "u")
    val sk = df.groupBy($"s").agg(thetaSketchAgg($"u").as("sk"))
    val est = sk.alias("a").join(sk.alias("b"),
        col("a.s") === lit("A") && col("b.s") === lit("B"))
      .select(thetaEstimate(thetaIntersect(col("a.sk"), col("b.sk"))))
      .collect()(0).getDouble(0)
    assert(est == 300.0, s"expected |A∩B|=300, got $est")
  }

  test("estimation mode: 2-sigma bounds bracket the true count beyond k") {
    import spark.implicits._
    val n = 200000L
    val est = (0L until n).toDF("u")
      .agg(thetaSketchAgg($"u").as("sk"))
      .select(thetaEstimate($"sk"), thetaLb($"sk"), thetaUb($"sk"))
      .collect()(0)
    assert(est.getDouble(0) != n.toDouble,
      "200k uniques must exceed k and enter estimation mode")
    assert(est.getDouble(1) <= n && n <= est.getDouble(2),
      s"true $n outside [${est.getDouble(1)}, ${est.getDouble(2)}]")
  }

  test("union-merge of per-batch sketches equals the one-shot sketch set") {
    import spark.implicits._
    val all = (0L until 3000L)
    val batches = all.grouped(1000).toSeq.zipWithIndex.map { case (b, i) =>
      b.toDF("u").agg(thetaSketchAgg($"u").as("sk")).withColumn("b", lit(i))
    }.reduce(_.unionByName(_))
    val merged = batches.agg(thetaUnionAgg($"sk").as("sk"))
      .select(thetaEstimate($"sk")).collect()(0).getDouble(0)
    assert(merged == 3000.0, s"union-merge lost members: $merged")
  }

  test("null inputs are skipped; an empty sketch estimates zero") {
    import spark.implicits._
    val est = Seq[Option[Long]](None, None).toDF("u")
      .agg(thetaSketchAgg($"u").as("sk"))
      .select(thetaEstimate($"sk")).collect()(0).getDouble(0)
    assert(est == 0.0)
  }
}
