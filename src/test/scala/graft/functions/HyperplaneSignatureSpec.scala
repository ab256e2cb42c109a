package graft.functions

import graft.SparkSpec
import graft.analytics.SimilarityQueries
import org.apache.spark.sql.functions._

/** The native signature expression must agree bit-for-bit with its
  * Column-algebra specification (same fold order, same sign test), in
  * both the interpreted (eval) and whole-stage-codegen paths. */
class HyperplaneSignatureSpec extends SparkSpec {

  private def corpus(n: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(64)((rng.nextGaussian() / 3).toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("native expression == Column-algebra spec on random corpora") {
    val df = corpus(500, 17)
      .withColumn("native", SimilarityQueries.signature(col("embedding")))
      .withColumn("spec", SimilarityQueries.signatureColumns(col("embedding")))
    assert(df.filter(col("native") =!= col("spec")).isEmpty)
    // and over the real embeddings table
    val real = graft.Tables(spark, sf(), "embeddings")
      .withColumn("native", SimilarityQueries.signature(col("embedding")))
      .withColumn("spec", SimilarityQueries.signatureColumns(col("embedding")))
    assert(real.filter(col("native") =!= col("spec")).isEmpty)
  }

  test("interpreted eval path agrees with codegen") {
    val df = corpus(100, 23)
    val withSig = df.withColumn("sig", SimilarityQueries.signature(col("embedding")))
    val codegenRows = withSig.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // force the interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = withSig.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(interp == codegenRows)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("stays inside whole-stage codegen and handles nulls") {
    import spark.implicits._
    // a file-backed scan (local relations are folded at plan time)
    val df = graft.Tables(spark, sf(), "embeddings")
      .withColumn("sig", SimilarityQueries.signature(col("embedding")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), "signature projection fell out of codegen")
    // null embedding → null signature
    val withNull = Seq((99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
      .withColumn("sig", SimilarityQueries.signature(col("embedding")))
    assert(withNull.select("sig").collect().head.isNullAt(0))
  }
}
