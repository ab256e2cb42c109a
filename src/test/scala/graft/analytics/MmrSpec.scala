package graft.analytics

import graft.SparkSpec

/** The point of MMR: the picked set trades a little relevance for
  * diversity — its average pairwise similarity must be strictly lower
  * than plain top-k's, while every pick still comes from the candidate
  * pool ranked by relevance. */
class MmrSpec extends SparkSpec {

  test("sim11 picks are more diverse than plain top-5 and ranked by " +
    "monotonically decreasing mmr") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._

    val picks = SimilarityQueries.sim11Mmr(spark, sf()).orderBy($"step")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(picks.map(_._1).toSeq == (1L to 5L))
    // greedy argmax ⇒ mmr scores can only decrease step over step
    assert(picks.map(_._4).sliding(2).forall { case Array(a, b) => b <= a
      case _ => true })

    val emb = graft.Tables(spark, sf(), "embeddings")
    def avgPairSim(ids: Set[Long]): Double = {
      val vs = emb.filter($"vec_id".isin(ids.toSeq: _*))
        .select($"vec_id", $"embedding").collect()
        .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
      val sims = for {
        i <- vs.indices; j <- vs.indices if i < j
      } yield {
        val (a, b) = (vs(i), vs(j))
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      sims.sum / sims.size
    }
    val top5 = SimilarityQueries.simCosineTopK(spark, sf())
      .orderBy(desc("cos"), $"vec_id").limit(5)
      .collect().map(_.getLong(0)).toSet
    val mmr5 = picks.map(_._2).toSet
    assert(mmr5.size == 5)
    assert(avgPairSim(mmr5) < avgPairSim(top5),
      s"MMR set not more diverse: ${avgPairSim(mmr5)} vs ${avgPairSim(top5)}")
    // the most relevant candidate is always the first pick
    assert(picks.head._2 == SimilarityQueries.simCosineTopK(spark, sf())
      .orderBy(desc("cos"), $"vec_id").head().getLong(0))
  }
}
