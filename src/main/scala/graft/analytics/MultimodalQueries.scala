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

  def mm1Features(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(Tables(spark, dir, "documents"))
    Multimodal.extractFeatures(media, dim = 4)
      .select(col("doc_id"), col("embedding"),
        col("meta").getItem("lang").as("lang"))
  }

  val mm1Sql: String = {
    val fs = (0 until 4).map { i =>
      s"CAST(CAST(('0x' || substring(md5('$i|' || text), 1, 15)) AS BIGINT)" +
        s" / 1.152921504606847e18 AS REAL)"
    }.mkString(", ")
    s"SELECT doc_id, [$fs] AS embedding, lang FROM documents"
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "mm1_features" -> QueryDef.of(mm1Sql)(mm1Features)
  )
}
