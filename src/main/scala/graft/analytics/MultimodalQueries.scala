package graft.analytics

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal pipeline exposed to the oracle: documents as opaque
  * binary media → stubbed deterministic feature extraction → typed
  * float vectors. The oracle recomputes the same content-hash features
  * from the text, proving the binary plumbing is value-preserving. */
object MultimodalQueries {

  /** Features are emitted one scalar row per (doc_id, dimension index)
    * rather than as an array column: the harness row-hash needs hashable
    * scalars, and the exploded shape is also what a feature-store sink
    * ingests. The pipeline itself (asMedia → extractFeatures) still
    * produces the dense `Array[Float]` column. */
  def mm1Features(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(Tables(spark, dir, "documents"))
    Multimodal.extractFeatures(media, dim = 4)
      .select(col("doc_id"), posexplode(col("embedding")),
        col("meta").getItem("lang").as("lang"))
      .select(col("doc_id"), col("pos").cast("long").as("i"),
        col("col").as("feature"), col("lang"))
  }

  val mm1Sql: String =
    """SELECT doc_id, i,
      |  CAST(CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || text), 1, 15)) AS BIGINT)
      |    / 1.152921504606847e18 AS REAL) AS feature,
      |  lang
      |FROM documents, generate_series(0, 3) g(i)""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "mm1_features" -> QueryDef.of(mm1Sql)(mm1Features)
  )
}
