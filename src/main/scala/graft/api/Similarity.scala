package graft.api

import graft.analytics.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The similarity-search surface generalized over any embedding
  * DataFrame — what an application calls to search or dedup a vector
  * corpus. Each builder is the oracle-proven registry shape with the
  * corpus/columns as parameters; SimilaritySpec pins the
  * instantiations to their verified twins. Scale posture matches the
  * registry queries (SCALE.md): query batches, codebooks, centroids
  * and probe structures broadcast; the corpus never shuffles.
  */
object Similarity {

  private def std(corpus: DataFrame, idCol: String, vecCol: String) =
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))

  /** Exact cosine top-k against one query vector (a 1-row frame with
    * the vector in `queryVecCol`). Broadcast query, one corpus scan,
    * per-partition heaps + driver merge — never a global sort. */
  def cosineTopK(corpus: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryVecCol: String = "embedding"): DataFrame =
    SimilarityQueries.cosineTopKFrom(
      std(corpus, idCol, vecCol), query.select(col(queryVecCol).as("qv")), k)

  /** k nearest neighbours for every row of a (small, broadcast) query
    * batch in ONE corpus scan + per-query window rank. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "vec_id", queryVecCol: String = "embedding"): DataFrame =
    SimilarityQueries.knnJoinFrom(
      std(corpus, idCol, vecCol),
      queries.select(col(queryIdCol).as("qid"), col(queryVecCol).as("qv")), k)

  /** MMR diversified top-k: the `pool` most relevant candidates come
    * from the distributed cosine scan, then the greedy
    * relevance-vs-diversity selection (λ=0.7) runs over that bounded
    * pool. Returns (step, vec_id, rel, mmr) in pick order. */
  def mmrTopK(corpus: DataFrame, query: DataFrame, k: Int = 5,
      pool: Int = 50, idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryVecCol: String = "embedding"): DataFrame =
    SimilarityQueries.mmrFrom(
      std(corpus, idCol, vecCol),
      query.select(col(queryVecCol).as("qv")), k, pool)

  /** Contrastive-pair mining: for each (broadcast) anchor, the k most
    * similar same-label vectors (`kind = pos`) and the k most similar
    * different-label vectors (`kind = neg` — the hard negatives a
    * contrastive trainer wants). One corpus scan, per-anchor running
    * top-k. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    def lab(df: DataFrame) = df.select(col(idCol).as("vec_id"),
      col(vecCol).as("embedding"), col(labelCol).as("label"))
    SimilarityQueries.hardNegativesFrom(lab(corpus), lab(anchors), k)
  }

  /** Embedding-quality evaluation: leave-one-out 1-NN label accuracy
    * per class (the oracle-proven emb3 shape) — one broadcast probe
    * batch, one corpus scan. */
  def knnAccuracy(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame =
    SimilarityQueries.emb3From(emb.select(col(idCol).as("vec_id"),
      col(vecCol).as("embedding"), col(labelCol).as("label")))
}
