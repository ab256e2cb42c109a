package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ST2, the Kafka commit-log tail. No broker and no spark-sql-kafka
  * connector ship in this sandbox, so the spec pins the two pieces that
  * are ours: the reader configuration the builder emits, and the
  * wire-record decode (run against a static frame with the connector's
  * fixed output schema — `decodeKafka` is plain column algebra, so it
  * behaves identically on the real stream).
  */
class KafkaTailSpec extends SparkSpec {

  private val tail = Subscriptions.KafkaTail(
    bootstrapServers = "k1:9092,k2:9092",
    topics = Seq("proj_pageview", "proj_click"),
    startingOffsets = """{"proj_pageview":{"0":42}}""",
    maxOffsetsPerTrigger = Some(50000L))

  test("ST2: reader options carry servers, subscription, offsets, rate cap") {
    val opts = Subscriptions.kafkaOptions(tail)
    assert(opts("kafka.bootstrap.servers") == "k1:9092,k2:9092")
    assert(opts("subscribe") == "proj_pageview,proj_click")
    assert(opts("startingOffsets") == """{"proj_pageview":{"0":42}}""")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    // a lost-offset range must FAIL the query by default, not silently
    // skip aged-out records — gap corruption for downstream indexes;
    // skipping is the explicit opt-out
    assert(opts("failOnDataLoss") == "true")
    assert(Subscriptions.kafkaOptions(
      tail.copy(failOnDataLoss = false))("failOnDataLoss") == "false")
    assert(!Subscriptions.kafkaOptions(tail.copy(maxOffsetsPerTrigger = None))
      .contains("maxOffsetsPerTrigger"))
  }

  test("ST2: wire records decode to the typed subscription frame") {
    import spark.implicits._
    // the connector's fixed output schema (key/value binary, topic,
    // partition, offset, timestamp, timestampType)
    val wire = Seq(
      ("proj_pageview", """{"_user":"u1","path":"/a"}""", 0, 7L),
      ("proj_click", """{"_user":"u2","path":"/b"}""", 1, 9L),
      ("other_pageview", """{"_user":"ux","path":"/x"}""", 0, 1L))
      .toDF("topic", "json", "partition", "offset")
      .select($"topic", encode($"json", "UTF-8").as("value"),
        lit(null).cast("binary").as("key"), $"partition", $"offset",
        current_timestamp().as("timestamp"), lit(0).as("timestampType"))
    val schema = StructType(Seq(
      StructField("_user", StringType), StructField("path", StringType)))
    val decoded = Subscriptions.decodeKafka(wire, "proj", schema)
    val rows = decoded.collect().map(r =>
      (r.getAs[String]("_collection"), r.getAs[String]("_user"),
        r.getAs[Long]("_kafka_offset"))).toSet
    // other project's topic filtered out; topic prefix stripped
    assert(rows == Set(("pageview", "u1", 7L), ("click", "u2", 9L)))
    // the decoded frame feeds the standard subscription planner
    val sub = StreamSubscription("s",
      Seq(CollectionStreamQuery("pageview", Some("path = '/a'"))))
    assert(Subscriptions.plan(decoded, sub).count() == 1)
  }

  test("ST2: load() honestly reports the missing connector here") {
    // If a spark-sql-kafka jar ever lands on the classpath this flips to
    // asserting the stream's wire schema; today the sandbox has neither
    // broker nor connector, so the builder must fail loudly, not wedge.
    try {
      val df = Subscriptions.kafkaStream(spark, tail)
      assert(df.columns.contains("value") && df.columns.contains("topic"))
    } catch {
      case e: Exception =>
        val msg = e.toString.toLowerCase
        assert(msg.contains("kafka"), s"unexpected failure: $e")
    }
  }
}
