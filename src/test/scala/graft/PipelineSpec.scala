package graft

import graft.core.SchemaRegistry
import graft.enrich.{MapperPipeline, TimestampMapper}
import graft.ingest.JsonIngest
import graft.multimodal.Multimodal
import graft.store.EventStore
import org.apache.spark.sql.functions._

/** SURVEY §7.2 minimum end-to-end slice: mixed-schema JSON → infer →
  * enrich (M1) → partitioned store → evolved read → segmentation —
  * every subsystem exercised once, plus the multimodal column path. */
class PipelineSpec extends SparkSpec {

  test("end-to-end: ingest → enrich → store → read → aggregate") {
    val registry = SchemaRegistry.inMemory()
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val now = 1_700_000_000_000L

    // batch 1: two events, one missing _time
    val b1 = JsonIngest.ingest(spark, registry, "demo", spark.sparkContext.parallelize(Seq(
      """{"collection": "pageview", "properties": {"_user": "u1", "_time": "2026-01-15 10:30:00.000", "page": "/a"}}""",
      """{"collection": "pageview", "properties": {"_user": "u2", "page": "/b"}}""")))
    val enriched1 = MapperPipeline.run(b1.byCollection("pageview"), Seq(TimestampMapper(now)))
    EventStore.write(enriched1, warehouse, "demo", "pageview")

    // batch 2 evolves the schema (adds `referrer`)
    val b2 = JsonIngest.ingest(spark, registry, "demo", spark.sparkContext.parallelize(Seq(
      """{"collection": "pageview", "properties": {"_user": "u1", "_time": "2026-02-01 09:00:00.000", "page": "/a", "referrer": "google"}}""")))
    EventStore.write(MapperPipeline.run(b2.byCollection("pageview"), Seq(TimestampMapper(now))),
      warehouse, "demo", "pageview")

    val back = EventStore.read(spark, registry, warehouse, "demo", "pageview")
    // registry order + null-filled referrer on old rows
    assert(back.columns.take(3).toSeq == Seq("_user", "_time", "page"))
    assert(back.count() == 3)
    assert(back.filter(col("referrer").isNull).count() == 2)
    // month partitions materialized from _time
    val months = back.select("_month").distinct().collect().map(_.getString(0)).toSet
    assert(months.contains("2026-01") && months.contains("2026-02"))
    // partition pruning: filter on _month reads one partition
    assert(back.filter(col("_month") === "2026-02").count() == 1)

    // segmentation over the stored table (A4 shape)
    val seg = back.groupBy(col("page")).agg(countDistinct(col("_user")).as("users"))
    assert(seg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("/a" -> 1L, "/b" -> 1L))
  }

  test("dead letters persist to the invalid_schema table") {
    val registry = SchemaRegistry.inMemory()
    val warehouse = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    JsonIngest.ingest(spark, registry, "demo", spark.sparkContext.parallelize(Seq(
      """{"collection": "c", "properties": {"n": 1.0}}""")))
    val bad = JsonIngest.ingest(spark, registry, "demo", spark.sparkContext.parallelize(Seq(
      """{"collection": "c", "properties": {"n": "junk"}}""")))
    EventStore.writeDeadLetter(bad.deadLetter, warehouse, "demo")
    val dl = spark.read.parquet(s"$warehouse/demo/invalid_schema")
    assert(dl.count() == 1)
    assert(dl.collect().head.getAs[String]("property") == "n")
  }

  test("multimodal: media schema, deterministic features, frame sampling") {
    val docs = Tables(spark, sf(), "documents").limit(50)
    val media = Multimodal.asMedia(docs)
    assert(media.schema("bytes").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media, dim = 4).collect()
    assert(feats.forall(_.getAs[scala.collection.Seq[Float]]("embedding").size == 4))
    val again = Multimodal.extractFeatures(media, dim = 4).collect()
    assert(feats.map(_.getAs[scala.collection.Seq[Float]]("embedding")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("embedding")).toSeq)

    val frames = Multimodal.sampleFrames(media.limit(3), everyNth = 100, maxFrames = 5)
    val byDoc = frames.groupBy("doc_id").count().collect()
    assert(byDoc.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 5))
    assert(frames.columns.contains("frame_offset"))
  }
}
