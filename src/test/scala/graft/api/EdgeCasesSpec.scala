package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Empty and degenerate inputs must flow through the public surface
  * without crashing — a pipeline stage that throws on an empty
  * partition dies on the first empty parquet file at scale. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyEvents = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType))))

  private val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))))

  test("analytics surface on an empty events table") {
    assert(Analytics.funnel(emptyEvents, "user_id", "ts", "event_type",
      Seq("view", "click")).collect().forall(_.getLong(1) == 0L))
    assert(Analytics.retention(emptyEvents, "user_id", "ts").isEmpty)
    assert(Analytics.sessionize(emptyEvents, "user_id", "ts",
      gap = "30 minutes", tieBreak = Some("event_id")).isEmpty)
    assert(Analytics.segmentation(emptyEvents, "ts", "day",
      Seq("event_type")).isEmpty)
    assert(Analytics.topKPerGroup(emptyEvents, "user_id", 3,
      col("ts").desc).isEmpty)
  }

  test("training-set surface on an empty corpus") {
    assert(TrainingSet.exactDedup(emptyDocs).isEmpty)
    assert(TrainingSet.dedupClusters(emptyDocs).isEmpty)
    assert(TrainingSet.decontaminate(emptyDocs, benchmark = emptyDocs)
      .columns.contains("contaminated"))
    assert(TrainingSet.sample(emptyDocs, "doc_id", "text",
      Map("x" -> 50)).isEmpty)
    assert(TrainingSet.epochShuffle(emptyDocs, "doc_id", "e0")
      .columns.contains("pos_key"))
  }

  test("single-row and all-duplicate corpora") {
    val one = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    assert(TrainingSet.dedupClusters(one).count() <= 1)
    val dups = (1L to 5L).map(i => (i, "same text repeated over and over again"))
      .toDF("doc_id", "text")
    val clusters = TrainingSet.dedupClusters(dups)
    // all five are one cluster labelled by the minimum id
    assert(clusters.select("cluster_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }
}
