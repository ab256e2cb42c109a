package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (`Array[Float]`, 64-d):
  * brute-force cosine top-k as the correctness baseline, and an
  * LSH-bucketed variant as the scale path.
  *
  * Engine parity: dot products fold left-to-right in array order with a
  * double accumulator (`aggregate` in Spark ≡ in-order `list_reduce` in
  * DuckDB), so every cosine is bit-identical IEEE-754 on both engines —
  * top-k ordering cannot diverge.
  *
  * Scale posture: the query vector is a broadcast single row; scoring is
  * a narrow map over the corpus (no shuffle); top-k is
  * TakeOrderedAndProject (per-partition heaps, driver merges k rows).
  * The LSH variant prunes the scan to one bucket — at 100 TB buckets
  * become partition keys so ANN reads only matching partitions.
  */
object SimilarityQueries {

  /** dot(a, b) with double accumulator, left-to-right. */
  private def dotExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin

  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** SIM1: brute-force cosine top-20 neighbours of vec_id 0. */
  def simCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" === 0L).select($"embedding".as("qv"))
    emb.filter($"vec_id" =!= 0L)
      .crossJoin(broadcast(q))
      .withColumn("dot", expr(dotExpr("embedding", "qv")))
      .withColumn("norm_e", expr(dotExpr("embedding", "embedding")))
      .withColumn("norm_q", expr(dotExpr("qv", "qv")))
      .withColumn("cos", $"dot" / (sqrt($"norm_e") * sqrt($"norm_q")))
      .orderBy($"cos".desc, $"vec_id")
      .limit(20)
      .select($"vec_id", $"label", $"cos")
  }

  val simCosineSql: String =
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, label, cos FROM (
       |  SELECT e.vec_id, e.label,
       |    ${sqlDot("e.embedding", "q.qv")} /
       |      (sqrt(${sqlDot("e.embedding", "e.embedding")}) *
       |       sqrt(${sqlDot("q.qv", "q.qv")})) AS cos
       |  FROM embeddings e, q
       |  WHERE e.vec_id <> 0)
       |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin

  /** SIM2: LSH-bucketed ANN. Bucket = sign pattern of the first 4
    * coordinates (axis-aligned random-hyperplane LSH for cosine); only
    * the query's bucket is scanned, then exact cosine ranks the
    * candidates. Bucket width trades recall for pruning — more bits at
    * larger corpus sizes. */
  def simAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketExpr =
      """aggregate(transform(slice(embedding, 1, 4),
        |  x -> CASE WHEN CAST(x AS DOUBLE) > 0.0 THEN 1L ELSE 0L END),
        |  CAST(0 AS LONG), (acc, b) -> acc * 2 + b)""".stripMargin
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("bucket", expr(bucketExpr))
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".as("qv"), $"bucket".as("qbucket"))
    emb.filter($"vec_id" =!= 0L)
      .crossJoin(broadcast(q))
      .filter($"bucket" === $"qbucket")
      .withColumn("dot", expr(dotExpr("embedding", "qv")))
      .withColumn("norm_e", expr(dotExpr("embedding", "embedding")))
      .withColumn("norm_q", expr(dotExpr("qv", "qv")))
      .withColumn("cos", $"dot" / (sqrt($"norm_e") * sqrt($"norm_q")))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", $"label", $"bucket", $"cos")
  }

  val simAnnSql: String = {
    val bucket = (e: String) =>
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(range(1, 5),
         |    i -> CASE WHEN CAST($e[i] AS DOUBLE) > 0.0 THEN 1 ELSE 0 END)),
         |  (acc, b) -> acc * 2 + b)""".stripMargin
    s"""WITH be AS (
       |  SELECT vec_id, label, embedding, ${bucket("embedding")} AS bucket
       |  FROM embeddings),
       |q AS (SELECT embedding AS qv, bucket AS qbucket FROM be WHERE vec_id = 0)
       |SELECT vec_id, label, bucket, cos FROM (
       |  SELECT e.vec_id, e.label, e.bucket,
       |    ${sqlDot("e.embedding", "q.qv")} /
       |      (sqrt(${sqlDot("e.embedding", "e.embedding")}) *
       |       sqrt(${sqlDot("q.qv", "q.qv")})) AS cos
       |  FROM be e, q
       |  WHERE e.vec_id <> 0 AND e.bucket = q.qbucket)
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  }

  /** SIM3: embedding-cosine near-duplicate pairs — all pairs in the same
    * LSH bucket with cosine above a threshold; the embedding-space
    * analogue of MinHash dedup. Bucketing keeps the pair join
    * near-linear. (Threshold 0.3 fits the synthetic corpus, whose
    * vectors are near-orthogonal; real near-dup pipelines run 0.95+.) */
  def simNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucketExpr =
      """aggregate(transform(slice(embedding, 1, 4),
        |  x -> CASE WHEN CAST(x AS DOUBLE) > 0.0 THEN 1L ELSE 0L END),
        |  CAST(0 AS LONG), (acc, b) -> acc * 2 + b)""".stripMargin
    // norms precomputed once per vector (O(n)), not per candidate pair
    // (O(pairs)) — the difference between linear and quadratic work in
    // the dominant cost at corpus scale.
    val emb = Tables(spark, dir, "embeddings")
      .withColumn("bucket", expr(bucketExpr))
      .withColumn("norm", sqrt(expr(dotExpr("embedding", "embedding"))))
      .select($"vec_id", $"embedding", $"bucket", $"norm")
    emb.alias("x")
      .join(emb.alias("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("dot", expr(dotExpr("x.embedding", "y.embedding")))
      .withColumn("cos", $"dot" / (col("x.norm") * col("y.norm")))
      .filter($"cos" > 0.3)
      .select(col("x.vec_id").as("vec1"), col("y.vec_id").as("vec2"), $"cos")
  }

  val simNearDupSql: String = {
    val bucket = (e: String) =>
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(range(1, 5),
         |    i -> CASE WHEN CAST($e[i] AS DOUBLE) > 0.0 THEN 1 ELSE 0 END)),
         |  (acc, b) -> acc * 2 + b)""".stripMargin
    s"""WITH be AS (
       |  SELECT vec_id, embedding, ${bucket("embedding")} AS bucket,
       |    sqrt(${sqlDot("embedding", "embedding")}) AS norm
       |  FROM embeddings)
       |SELECT vec1, vec2, cos FROM (
       |  SELECT x.vec_id AS vec1, y.vec_id AS vec2,
       |    ${sqlDot("x.embedding", "y.embedding")} / (x.norm * y.norm) AS cos
       |  FROM be x JOIN be y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
       |WHERE cos > 0.3""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "sim1_cosine_topk" -> QueryDef.of(simCosineSql)(simCosineTopK),
    "sim2_ann_lsh" -> QueryDef.of(simAnnSql)(simAnnLsh),
    "sim3_near_dup" -> QueryDef.of(simNearDupSql)(simNearDup)
  )
}
