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

  test("hardNegatives == oracle-proven hn1; kinds obey the label split") {
    val api = Similarity.hardNegatives(
      emb.select("vec_id", "embedding", "label"),
      anchors = emb.filter(col("vec_id") < 8), k = 3)
    val reg = SimilarityQueries.hn1HardNegatives(spark, sf())
    assert(rows(api) == rows(reg))
    // a positive shares the anchor's label; a hard negative never does
    val anchorLabel = emb.filter(col("vec_id") < 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    reg.collect().foreach { r =>
      val (qid, kind, label) = (r.getLong(0), r.getString(1), r.getLong(4))
      if (kind == "pos") assert(label == anchorLabel(qid).toLong)
      else assert(label != anchorLabel(qid).toLong)
    }
  }

  test("knnAccuracy == oracle-proven emb3; separable labels score 1.0") {
    val api = Similarity.knnAccuracy(emb)
    val reg = SimilarityQueries.emb3KnnAccuracy(spark, sf())
    assert(rows(api) == rows(reg))
    // a perfectly label-clustered space: label = axis of the one-hot
    import spark.implicits._
    val perfect = (0L until 80L).map { i =>
      val l = (i % 4).toInt
      val v = Array.fill(4)(0.001f); v(l) = 1.0f
      (i, v.toSeq, l)
    }.toDF("vec_id", "embedding", "label")
    val acc = Similarity.knnAccuracy(perfect)
      .select("accuracy").collect().map(_.getDouble(0))
    assert(acc.forall(_ == 1.0), acc.toSeq)
    // a zero vector (padding row / failed encode) must not poison the
    // metric: its cosine is NaN, which sorts above every real
    // similarity — the fence excludes it from corpus and probes
    val poisoned = perfect.unionByName(
      Seq((999L, Seq.fill(4)(0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val acc2 = Similarity.knnAccuracy(poisoned)
      .select("accuracy").collect().map(_.getDouble(0))
    assert(acc2.forall(_ == 1.0), acc2.toSeq)
    // offset ids (no id below 64) still yield probes — selection is
    // hash-ordered, not id-range-bound
    val offset = perfect.withColumn("vec_id", col("vec_id") + 1000000L)
    assert(Similarity.knnAccuracy(offset).count() > 0)
  }
}
