package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batching, partition shape, column
  * contracts) is real; the codec itself is STUBBED with a deterministic
  * content-hash feature extractor because no image/audio libraries ship
  * in this environment — swap [[featureVector]]'s body for a real
  * decoder (JNI/FFI or Pandas-UDF-style batch call) and every
  * downstream stage (similarity search, near-dup, ANN) is unchanged,
  * since they only see the `Array[Float]` feature column.
  */
object Multimodal {

  /** media(doc_id, kind, bytes, meta) — the storage contract: payload
    * opaque, metadata queryable. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text").as("kind"),
      col("text").cast("binary").as("bytes"),
      map(
        lit("lang"), col("lang"),
        lit("source"), col("source"),
        lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** STUB decode→feature: `dim` floats in [0,1) derived from a 60-bit
    * content hash per (byte-payload, index) — deterministic, portable,
    * and shaped exactly like a real embedding head (dense float vector
    * per row, computed batch-wise inside the scan projection, no
    * shuffle). */
  def featureVector(bytes: Column, dim: Int): Column = {
    val fs = (0 until dim).map { i =>
      (conv(substring(md5(concat(lit(s"$i|"), bytes.cast("string"))), 1, 15), 16, 10)
        .cast("double") / lit(1.152921504606847e18)).cast("float")
    }
    array(fs: _*)
  }

  /** Feature extraction stage: media → (doc_id, embedding, meta). */
  def extractFeatures(media: DataFrame, dim: Int = 4): DataFrame =
    media.select(
      col("doc_id"),
      featureVector(col("bytes"), dim).as("embedding"),
      col("meta"))

  /** Frame sampling for time-based media (video/audio): one row per
    * sampled frame offset; a real decoder would slice the payload at
    * the container level — the explode shape and per-frame keys are
    * what downstream stages depend on. */
  def sampleFrames(media: DataFrame, everyNth: Int, maxFrames: Int): DataFrame =
    media
      .withColumn("n_frames",
        least(greatest(length(col("bytes")) / everyNth, lit(1)), lit(maxFrames)))
      .select(col("doc_id"), col("kind"), col("bytes"), col("meta"),
        explode(sequence(lit(0), col("n_frames").cast("int") - 1)).as("frame_no"))
      .withColumn("frame_offset", col("frame_no") * everyNth)
}
