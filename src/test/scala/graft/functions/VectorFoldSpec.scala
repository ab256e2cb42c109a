package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** The native vector kernels must agree bit-for-bit with their
  * higher-order-function specifications (same cast, same left-to-right
  * double fold), in both the interpreted and codegen paths, and
  * reproduce the HOF null semantics (null array / length mismatch /
  * null element → null). */
class VectorFoldSpec extends SparkSpec {

  private def dot(a: Column, b: Column) =
    GraftColumnBridge.column(VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  private def sqdist(a: Column, b: Column) =
    GraftColumnBridge.column(VectorSqDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  private val dotSpec = expr(
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
  private val distSpec = expr(
    """aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
      |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  private def corpus(n: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(64)((rng.nextGaussian() / 3).toFloat),
        Array.fill(64)(rng.nextGaussian() / 3))
    }.toDF("id", "a", "b")
  }

  test("native kernels == HOF specs, bit-for-bit, float×double inputs") {
    val df = corpus(500, 11)
      .withColumn("nd", dot(col("a"), col("b")))
      .withColumn("sd", dotSpec)
      .withColumn("nq", sqdist(col("a"), col("b")))
      .withColumn("sq", distSpec)
    // =!= is false for equal values incl. exact double equality
    assert(df.filter(col("nd") =!= col("sd") || col("nq") =!= col("sq")).isEmpty)
    // float×float over the real table (embedding · embedding)
    val real = graft.Tables(spark, sf(), "embeddings")
      .withColumn("n", dot(col("embedding"), col("embedding")))
      .withColumn("s", expr(
        """aggregate(zip_with(embedding, embedding,
          |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
    assert(real.filter(col("n") =!= col("s")).isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    // Build the DataFrame FRESH under each conf regime: QueryExecution
    // caches the executed plan at first action, so reusing one df would
    // run the identical compiled plan twice. Read from the parquet table
    // (not a LocalRelation, which ConvertToLocalRelation can fold on the
    // driver) so the codegen run provably goes through WholeStageCodegen
    // — both asserted on the plan string below.
    def build() = graft.Tables(spark, sf(), "embeddings")
      .withColumn("d", dot(col("embedding"), reverse(col("embedding"))))
      .withColumn("q", sqdist(col("embedding"), reverse(col("embedding"))))
      .select(col("vec_id"), col("d"), col("q"))
    val cg = build()
    val codegen = cg.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(cg.queryExecution.executedPlan.toString.contains("*(1)"),
      "codegen side did not run inside whole-stage codegen")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val in = build()
      val interp = in.collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(!in.queryExecution.executedPlan.toString.contains("*(1)"),
        "interpreted side still ran under whole-stage codegen")
      assert(interp == codegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("HOF null semantics: null array, length mismatch, null element") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // ok
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f, 2.0f)), // null array
      (3L, Array(1.0f), Array(1.0f, 2.0f)))          // length mismatch
      .toDF("id", "a", "b")
      .withColumn("d", dot(col("a"), col("b")))
      .withColumn("s", dotSpec)
    val got = rows.select("id", "d", "s").collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(got(1L) == ((false, false)))
    assert(got(2L) == ((true, true)))
    assert(got(3L) == ((true, true)))
    // null ELEMENT (needs explicit schema: Array[java.lang.Float])
    val withNullElem = Seq((4L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .withColumn("d", dot(col("a"), col("b")))
      .withColumn("s", dotSpec)
      .select("d", "s").collect().head
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("kernels stay inside whole-stage codegen") {
    val df = graft.Tables(spark, sf(), "embeddings")
      .withColumn("n", dot(col("embedding"), col("embedding")))
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
      "vector kernel fell out of whole-stage codegen")
  }
}
