package graft.api

import graft.{SparkSpec, Tables}
import graft.analytics.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facade instantiations must coincide with their oracle-verified
  * registry twins on the test corpus. */
class SimilaritySpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val emb = Tables(spark, sf(), "embeddings")

  test("cosineTopK == oracle-proven sim1") {
    val api = Similarity.cosineTopK(
      emb.filter(col("vec_id") =!= 0L).select("vec_id", "embedding"),
      query = emb.filter(col("vec_id") === 0L), k = 20)
      .select("vec_id", "cos")
    val reg = SimilarityQueries.simCosineTopK(spark, sf())
      .select("vec_id", "cos")
    assert(rows(api) == rows(reg))
  }

  test("mmrTopK == oracle-proven sim11") {
    val api = Similarity.mmrTopK(
      emb.filter(col("vec_id") =!= 0L).select("vec_id", "embedding"),
      query = emb.filter(col("vec_id") === 0L), k = 5, pool = 50)
    val reg = SimilarityQueries.sim11Mmr(spark, sf())
    assert(rows(api) == rows(reg))
  }

  test("knnJoin == oracle-proven sim6") {
    val api = Similarity.knnJoin(
      emb.select("vec_id", "embedding"),
      queries = emb.filter(col("vec_id") < SimilarityQueries.KnnQueries),
      k = SimilarityQueries.KnnK)
    val reg = SimilarityQueries.sim6KnnJoin(spark, sf())
    assert(rows(api) == rows(reg))
  }
}
