package graft.streaming

import graft.SparkSpec
import graft.store.{RecordProducers, StreamSinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The store→stream wire round-trip over [[MiniBroker]] — producing
  * through the REAL executor drain (`RecordProducers.produce`) and
  * decoding through the REAL tail decode (`Subscriptions.decodeKafka`),
  * with Kafka's observable broker semantics (default-partitioner
  * placement, per-partition contiguous offsets, retention truncation)
  * in between. This is the KafkaEventStore.java:82-126 contract minus
  * only the socket: no broker binary or connector jar exists in this
  * sandbox (Subscriptions.kafkaStream documents the seam), so the wire
  * layer itself is the simulation — everything on either side of it is
  * production code.
  */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("u1", "2026-01-15 10:00:00", "click", 1.0),
    ("u2", "2026-01-15 10:01:00", "view", 2.0),
    ("u1", "2026-01-15 10:02:00", "click", 3.0),
    ("u3", "2026-01-15 10:03:00", "purchase", 4.0),
    ("u2", "2026-01-15 10:04:00", "view", 5.0),
    ("u1", "2026-01-15 10:05:00", "click", 6.0))
    .toDF("_user", "_time", "event_type", "value")

  private val valueSchema = StructType(Seq(
    StructField("_user", StringType), StructField("_time", StringType),
    StructField("event_type", StringType), StructField("value", DoubleType)))

  private def brokerFrame(b: MiniBroker) = {
    val rows = b.allRecords.map { case (t, p, o, k, v, ts) => (t, p, o, k, v, ts) }
    rows.toDF("topic", "partition", "offset", "key", "value", "timestamp")
  }

  test("S9/ST2: produce → broker → decode round-trips every event, " +
    "keyed per user onto one partition with contiguous offsets") {
    val broker = new MiniBroker(numPartitions = 4)
    MiniBroker.register("wire-rt", broker)
    val transport = () => new RecordProducers.RecordTransport {
      def send(batch: IndexedSeq[RecordProducers.ProducerRecord]): Seq[Int] = {
        batch.foreach(r => MiniBroker.get("wire-rt").append(r.target, r.key, r.value))
        Seq.empty
      }
    }
    // one source partition: the drain's ordering contract is per-key
    // WITHIN a Spark partition (RecordProducers.produce doc) — across
    // partitions send order is deliberately undefined
    val report = RecordProducers.produce(
      RecordProducers.kafkaRecords(events.coalesce(1), "demo", "pageview"),
      transport)
    assert(report.nSent == 6 && report.nDropped == 0)
    assert(broker.topics == Seq("demo_pageview"))

    // Kafka contract: a key lands on exactly ONE partition (murmur2
    // default partitioner), and each partition's offsets are contiguous
    val byKey = broker.allRecords.groupBy(_._4).view.mapValues(_.map(_._2).distinct)
    byKey.foreach { case (k, ps) =>
      assert(ps.size == 1, s"key $k spread over partitions $ps")
    }
    (0 until broker.numPartitions).foreach { p =>
      val offs = broker.allRecords.filter(_._2 == p).map(_._3).sorted
      assert(offs == (0L until offs.length.toLong).toSeq,
        s"partition $p offsets not contiguous: $offs")
    }

    // the REAL decode path over the connector-shaped frame
    val decoded = Subscriptions.decodeKafka(brokerFrame(broker), "demo", valueSchema)
    assert(decoded.columns.toSeq ==
      Seq("_collection", "_user", "_time", "event_type", "value",
        "_kafka_partition", "_kafka_offset"))
    val back = decoded.select($"_user", $"_time", $"event_type", $"value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    val original = events.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(back == original, "round-trip lost or corrupted events")
    assert(decoded.filter($"_collection" =!= "pageview").count() == 0)

    // per-key delivery order survives: offsets increase in send order
    val u1 = broker.allRecords.filter(_._4 == "u1").sortBy(_._3).map(_._5)
    val u1Values = u1.map(v => v.substring(v.indexOf("\"value\":") + 8).takeWhile(c => c.isDigit || c == '.'))
    assert(u1Values == Seq("1.0", "3.0", "6.0"), s"per-key order broken: $u1Values")
  }

  test("ST3: failOnDataLoss — resuming below the aged-out log-start " +
    "kills the tail by default, opt-out skips and counts the loss") {
    val broker = new MiniBroker(numPartitions = 1)
    (1 to 10).foreach(i => broker.append("demo_t", s"k$i", s"v$i"))
    // consumer stored offset 3, then retention aged out [0, 5)
    broker.truncateBefore("demo_t", 0, 5L)
    assert(broker.startOffset("demo_t", 0) == 5L && broker.endOffset("demo_t", 0) == 10L)

    // the engine's default (Subscriptions.KafkaTail.failOnDataLoss=true,
    // pinned in KafkaTailSpec): a silent gap is data corruption → throw
    intercept[MiniBroker.DataLossException] {
      broker.fetch("demo_t", 0, from = 3L)
    }
    // explicit opt-out: liveness over completeness — skip to log-start,
    // report exactly how many records were lost
    val (recs, lost) = broker.fetch("demo_t", 0, from = 3L, failOnDataLoss = false)
    assert(lost == 2L && recs.map(_.offset) == (5L to 9L).toSeq)
    // a reader at or past log-start is never a loss
    val (tail, none) = broker.fetch("demo_t", 0, from = 7L)
    assert(none == 0L && tail.map(_.offset) == (7L to 9L).toSeq)
  }

  test("wire: murmur2 matches Kafka's partitioner shape — deterministic, " +
    "non-negative routing, spread across partitions") {
    val b = new MiniBroker(numPartitions = 8)
    val keys = (1 to 1000).map(i => s"user-$i")
    val parts = keys.map(b.partitionFor)
    assert(parts.forall(p => p >= 0 && p < 8))
    // deterministic
    assert(keys.map(b.partitionFor) == parts)
    // all 8 partitions used over 1000 keys (probability of a miss ~0)
    assert(parts.distinct.size == 8)
    // a known algebraic property of the Kafka hash: empty key routes too
    assert(b.partitionFor("") >= 0)
  }

  test("S9/ST2: a mid-produce broker bounce retries through the drain " +
    "and still yields a gapless, duplicate-free log") {
    val broker = new MiniBroker(numPartitions = 2)
    MiniBroker.register("wire-bounce", broker)
    // transport fails the whole first batch attempt per task, then heals
    val transport = () => new RecordProducers.RecordTransport {
      var first = true
      def send(batch: IndexedSeq[RecordProducers.ProducerRecord]): Seq[Int] =
        if (first) { first = false; batch.indices }
        else { batch.foreach(r => MiniBroker.get("wire-bounce").append(r.target, r.key, r.value)); Seq.empty }
    }
    val report = RecordProducers.produce(
      RecordProducers.kafkaRecords(events.repartition(1), "demo", "pageview"),
      transport)
    assert(report.nSent == 6 && report.nDropped == 0 && report.nRetriedRecords == 6)
    val total = (0 until 2).map(p => broker.endOffset("demo_pageview", p) -
      broker.startOffset("demo_pageview", p)).sum
    assert(total == 6, "retry produced duplicates or lost records")
  }
}
