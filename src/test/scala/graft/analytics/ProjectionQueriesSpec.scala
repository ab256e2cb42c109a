package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JL projection contracts: shape, linearity (projection of a zero
  * vector is zero; scaling the input scales the output), the
  * distortion audit's internal consistency, and the scan-only plan. */
class ProjectionQueriesSpec extends SparkSpec {

  test("emb1: every vector reduces to OutDims components") {
    // the registered row emits one double column per component (the
    // comparator cannot hash arrays); vec_id + r00..r15
    val df = ProjectionQueries.emb1RandProjection(spark, sf())
    assert(df.columns.length == 1 + ProjectionQueries.OutDims)
    assert(df.columns.tail.forall(_.matches("r\\d\\d")))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to ProjectionQueries.OutDims).foreach(i => r.getDouble(i))
    }
  }

  test("projection is linear: zero maps to zero, 2x input gives 2x output") {
    import spark.implicits._
    val dims = 64
    val base = Array.tabulate(dims)(i => (i % 7 - 3).toFloat)
    val frame = Seq(
      (0L, Array.fill(dims)(0f)),
      (1L, base),
      (2L, base.map(_ * 2))
    ).toDF("vec_id", "embedding")
    val red = frame.select($"vec_id",
      ProjectionQueries.reduced($"embedding").as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(red(0L).forall(_ == 0.0))
    red(1L).zip(red(2L)).foreach { case (x, y) =>
      assert(math.abs(y - 2 * x) < 1e-9, s"linearity: $x vs $y")
    }
  }

  test("emb2: audit pairs cover the sample, ratio = d2_reduced / d2_orig") {
    val rows = ProjectionQueries.emb2JlDistortion(spark, sf()).collect()
    val n = ProjectionQueries.AuditVecs
    assert(rows.length == n * (n - 1) / 2)
    rows.foreach { r =>
      val (o, d, ratio) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(o > 0, "distinct sample vectors must be apart")
      assert(ratio == d / o)
      // JL with 16 dims is loose, but a sane projection keeps the
      // squared-distance ratio within an order of magnitude
      assert(ratio > 0.1 && ratio < 10, s"distortion out of envelope: $ratio")
    }
  }

  test("plan: emb1 is scan-only — no exchange anywhere") {
    val plan = ProjectionQueries.emb1RandProjection(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
