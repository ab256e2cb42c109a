package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native expressions: a session built with
  * `graft.GraftExtensions` can call `hyperplane_signature` from raw
  * SQL, and it agrees with the DataFrame API. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("hyperplane_signature registers and matches the DataFrame API") {
    // force a NEW session (getOrCreate would reuse the suite-shared one,
    // which was built without extensions); the SparkContext is shared,
    // so the session must not be stopped — just unset as default after.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      // programmatic form — `spark.sql.extensions` is a static conf and
      // would be ignored once another suite created the first session
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
      Tables(spark, "/root/testdata/sf0.001", "embeddings")
        .createOrReplaceTempView("emb_ext")
      val viaSql = spark.sql(
        "SELECT vec_id, hyperplane_signature(embedding) AS sig FROM emb_ext")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaApi = Tables(spark, "/root/testdata/sf0.001", "embeddings")
        .select(org.apache.spark.sql.functions.col("vec_id"),
          analytics.SimilarityQueries.signature(
            org.apache.spark.sql.functions.col("embedding")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaSql == viaApi && viaSql.nonEmpty)
      // arity is enforced
      intercept[Exception](spark.sql("SELECT hyperplane_signature(1, 2)").collect())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
