package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ST2: commit-log replay — the events table re-read as a file-source
  * stream must reproduce batch results exactly (the "events visible to
  * streams as stored" contract, ST7). */
class ReplaySpec extends SparkSpec {

  // the commit-log dir: events materialized once, streamed as files
  private lazy val logDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    Tables(spark, sf(), "events").write.mode("overwrite").parquet(dir)
    dir
  }

  test("file-source replay of events matches batch filter + projection") {
    val batchDf = spark.read.parquet(logDir)
    val stream = spark.readStream
      .schema(batchDf.schema)
      .parquet(logDir)
      .withColumn("_collection", col("event_type"))
    val sub = StreamSubscription("replay",
      Seq(CollectionStreamQuery("click", Some("value > 150.0"))),
      columns = Seq("event_id", "value"))
    val q = Subscriptions.syncOnce(Subscriptions.plan(stream, sub), "replay_out")

    val streamed = spark.table("replay_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = batchDf.filter(col("event_type") === "click" && col("value") > 150.0)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    q.stop()
  }

  test("streaming segmentation equals batch segmentation on replay") {
    // watermarks need TIMESTAMP (ltz) event time; NTZ is cast in UTC
    val batchDf = spark.read.parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val stream = spark.readStream.schema(spark.read.parquet(logDir).schema)
      .parquet(logDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("seg_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("seg_out")
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[Any]("day").toString, r.getString(1), r.getLong(2))).toSet
    val batch = batchDf
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .collect().map(r => (r.getAs[Any]("day").toString, r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    q.stop()
  }
}
