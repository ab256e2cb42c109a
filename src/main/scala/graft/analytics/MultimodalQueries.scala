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

  /** MM2: frame sampling proven end-to-end — every sampled frame's
    * byte-slice digest must match the oracle slicing the same payload
    * as text (the corpus is ASCII, so byte and char offsets agree).
    * Shows the per-frame contract: (doc_id, frame_no, offset, bytes). */
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(Tables(spark, dir, "documents"))
    Multimodal.sampleFrames(media, everyNth = 64, maxFrames = 8)
      .select(col("doc_id"),
        col("frame_no").cast("long").as("frame_no"),
        col("frame_offset").cast("long").as("frame_offset"),
        md5(expr("substring(bytes, frame_offset + 1, 64)")).as("frame_digest"))
  }

  val mm2Sql: String =
    """WITH f AS (
      |  SELECT doc_id, text,
      |    CAST(floor(least(greatest(length(text)/64.0, 1), 8)) AS INT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
      |  CAST(i * 64 AS BIGINT) AS frame_offset,
      |  md5(substring(text, i * 64 + 1, 64)) AS frame_digest
      |FROM (SELECT doc_id, text, unnest(range(n_frames)) AS i FROM f)""".stripMargin

  /** MM3: the resize stage proven end-to-end — each payload shrinks to
    * the target byte budget in one scan-side projection, the metadata
    * map carries the before/after sizes, and the oracle recomputes the
    * truncated content's digest from the text (ASCII corpus: byte and
    * char offsets agree). Payloads already under budget pass through
    * unchanged — the digest proves THAT too, not just the size math. */
  def mm3ResizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMedia(Tables(spark, dir, "documents"))
    Multimodal.resize(media, targetBytes = 128)
      .select(col("doc_id"),
        col("meta").getItem("orig_bytes").cast("long").as("orig_bytes"),
        col("meta").getItem("resized_bytes").cast("long").as("resized_bytes"),
        md5(col("bytes")).as("resized_digest"),
        col("meta").getItem("lang").as("lang"))
  }

  val mm3Sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS orig_bytes,
      |  CAST(length(substring(text, 1, 128)) AS BIGINT) AS resized_bytes,
      |  md5(substring(text, 1, 128)) AS resized_digest,
      |  lang
      |FROM documents""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "mm1_features" -> QueryDef.of(mm1Sql)(mm1Features),
    "mm2_frame_sample" -> QueryDef.of(mm2Sql)(mm2FrameSample),
    "mm3_resize_audit" -> QueryDef.of(mm3Sql)(mm3ResizeAudit)
  )
}
