package graft.store

import graft.SparkSpec
import graft.core.{FieldType, SchemaRegistry}
import graft.enrich.{CustomMapper, WebhookTransform}
import graft.ingest.{AvroIngest, JsonIngest}
import org.apache.spark.sql.functions._

class SinksAndCustomMapperSpec extends SparkSpec {
  import spark.implicits._

  test("M7: custom mapper get/set/setOnce/drop contract") {
    val df = Seq(
      ("pageview", "u1", 10.0, null.asInstanceOf[String]),
      ("pageview", "bot", 1.0, "preset"))
      .toDF("collection", "_user", "value", "note")
    val m = CustomMapper("score", Seq("score" -> FieldType.DOUBLE, "note" -> FieldType.STRING),
      Map("factor" -> "2"), (e, params) => {
        if (e.get("_user") == "bot") e.drop()
        else {
          e.set("score", e.get("value").asInstanceOf[Double] * params("factor").toDouble)
          e.setOnce("note", "computed") // must not clobber the preset row
        }
      })
    val out = m.apply(df).collect()
    assert(out.length == 1) // bot dropped
    assert(out.head.getAs[Double]("score") == 20.0)
    assert(out.head.getAs[String]("note") == "computed")

    // setOnce respects existing values: run without the drop
    val keep = CustomMapper("keep", Seq("note" -> FieldType.STRING), Map.empty,
      (e, _) => e.setOnce("note", "computed"))
    val rows = keep.apply(df).collect()
    assert(rows.map(_.getAs[String]("note")).toSet == Set("computed", "preset"))
  }

  test("S7: webhook transform fans one body into n events") {
    val bodies = spark.sparkContext.parallelize(Seq(
      """{"items": [{"v": 1}, {"v": 2}]}"""))
    val lines = WebhookTransform(bodies, { body =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val items = m.readTree(body).get("items")
      (0 until items.size()).map { i =>
        s"""{"collection": "hook", "properties": {"v": ${items.get(i).get("v")}}}"""
      }
    })
    val r = SchemaRegistry.inMemory()
    val res = JsonIngest.ingest(spark, r, "p", lines)
    assert(res.byCollection("hook").count() == 2)
  }

  test("S9: kafka shape — topic per project_collection, magic fields dropped") {
    val df = Seq(("u1", "1.2.3.4", 5.0)).toDF("_user", "_ip", "value")
    val shaped = StreamSinks.kafkaShape(df, "p", "pageview").collect().head
    assert(shaped.getAs[String]("topic") == "p_pageview")
    assert(shaped.getAs[String]("key") == "u1")
    assert(!shaped.getAs[String]("value").contains("_ip")) // source field excluded
    assert(shaped.getAs[String]("value").contains("\"value\":5.0"))
  }

  test("S10: salted shard keys are deterministic and spread") {
    val df = spark.range(1000).select($"id", lit("hot_user").as("_user"))
    val keys = StreamSinks.saltedShards(df, "p", "c", 16)
      .select("_shard_key").distinct().collect().map(_.getString(0))
    assert(keys.length > 8 && keys.length <= 16) // skewed key fans out
    val again = StreamSinks.saltedShards(df, "p", "c", 16)
      .select("_shard_key").distinct().collect().map(_.getString(0))
    assert(keys.sorted.toSeq == again.sorted.toSeq) // replay-safe
  }

  test("S11: avro bulk blobs + manifest round-trip through AvroIngest") {
    val dir = graft.TempDirs.scratch("graft-bulk").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("event_id", "name", "value").repartition(2)
    val manifest = StreamSinks.avroBulk(df, dir, "p", "events")
    val blobs = manifest.collect()
    assert(blobs.map(_.getAs[Long]("n_events")).sum == 3)
    assert(blobs.forall(_.getAs[String]("blob").endsWith(".avro")))

    val r = SchemaRegistry.inMemory()
    r.getOrCreate("p", "events", Seq(
      r.Field("event_id", FieldType.LONG),
      r.Field("name", FieldType.STRING),
      r.Field("value", FieldType.DOUBLE)))
    val back = AvroIngest.ingest(spark, r, "p", "events", s"$dir/*.avro")
    assert(back.count() == 3)
    assert(back.agg(sum("value")).collect().head.getDouble(0) == 7.5)
  }
}
