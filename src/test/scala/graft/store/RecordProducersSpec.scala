package graft.store

import graft.SparkSpec
import graft.store.RecordProducers._
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** S9/S10 producer drain. The transport is the in-memory test double
  * (local[*] shares one JVM, so the executor-side sends land in the
  * static recorder); everything around it — batching, size guard,
  * failed-index retry, ordering, driver-side report — is the real code
  * path a broker-backed transport would use. */
object RecordingTransport {
  val sent = new ConcurrentLinkedQueue[(Int, ProducerRecord)]() // (batchSize, rec)
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  // values that must fail on their first `failTimes` attempts
  @volatile var failTimes: Map[String, Int] = Map.empty
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def reset(fails: Map[String, Int] = Map.empty): Unit = {
    sent.clear(); batchSizes.clear(); attempts.clear(); failTimes = fails
  }
  def make(): RecordTransport = new RecordTransport {
    def send(batch: IndexedSeq[ProducerRecord]): Seq[Int] = {
      batchSizes.add(batch.size)
      batch.zipWithIndex.flatMap { case (r, i) =>
        val n = attempts.merge(r.value, 1,
          (a, b) => Integer.valueOf(a + b)).toInt
        if (n <= failTimes.getOrElse(r.value, 0)) Some(i)
        else { sent.add((batch.size, r)); None }
      }
    }
  }
}

class RecordProducersSpec extends SparkSpec {
  import spark.implicits._

  // range with explicit slices: deterministic contiguous partitions
  // (exact sizes for the batch-count assertion, source order preserved
  // for the ordering assertion — a repartition shuffle guarantees neither)
  private def shaped(n: Int, parts: Int = 2) =
    spark.range(0, n, 1, parts)
      .select(lit("t1").as("target"),
        concat(lit("u"), col("id") % 7).as("key"),
        concat(lit("v"), col("id")).as("value"))

  test("S9/S10: batches are capped, all records delivered, report adds up") {
    RecordingTransport.reset()
    val report = produce(shaped(1234), () => RecordingTransport.make(),
      maxPerBatch = 100)
    assert(report == SendReport(1234, 14, 0, 0, 0)) // 2 partitions: ceil splits
    assert(RecordingTransport.batchSizes.asScala.forall(_ <= 100))
    assert(RecordingTransport.sent.asScala.map(_._2.value).toSet ==
      (0 until 1234).map(i => s"v$i").toSet)
  }

  test("S9/S10: only failed indexes retry; delivery succeeds within budget") {
    RecordingTransport.reset(fails = Map("v3" -> 1, "v7" -> 2))
    val report = produce(shaped(10, parts = 1), () => RecordingTransport.make())
    // v3 fails once then lands, v7 fails twice then lands: 3 retried
    // record-sends, nothing dropped, every record delivered exactly once
    assert(report == SendReport(10, 1, 3, 0, 0))
    val values = RecordingTransport.sent.asScala.map(_._2.value).toSeq
    assert(values.sorted == (0 until 10).map(i => s"v$i").sorted)
    // the retry batches carried ONLY the failed records
    assert(RecordingTransport.batchSizes.asScala.map(_.toInt).toSeq
      .sorted.reverse.take(3) == Seq(10, 2, 1))
  }

  test("S9/S10: records failing past maxRetries are dropped and counted") {
    RecordingTransport.reset(fails = Map("v2" -> 99))
    val report = produce(shaped(5, parts = 1), () => RecordingTransport.make(),
      maxRetries = 2)
    assert(report.nSent == 4 && report.nDropped == 1)
    assert(report.nRetriedRecords == 2) // one per retry round
    assert(!RecordingTransport.sent.asScala.exists(_._2.value == "v2"))
  }

  test("S9/S10: oversized records are rejected up front, never sent") {
    RecordingTransport.reset()
    val big = "x" * (MaxRecordBytes + 1)
    val df = Seq(("t1", "k1", "small"), ("t1", "k2", big))
      .toDF("target", "key", "value").coalesce(1)
    val report = produce(df, () => RecordingTransport.make())
    assert(report.nSent == 1 && report.nRejectedOversize == 1)
    assert(RecordingTransport.sent.asScala.map(_._2.value).toSeq == Seq("small"))
  }

  test("S9: source order within a partition is preserved (per-key ordering)") {
    RecordingTransport.reset()
    produce(shaped(50, parts = 1), () => RecordingTransport.make(),
      maxPerBatch = 7)
    val values = RecordingTransport.sent.asScala.map(_._2.value).toSeq
    assert(values == (0 until 50).map(i => s"v$i"))
  }

  test("S10: kinesisShape emits stream target, salted key, mapless payload") {
    val events = Seq(("u1", "10.0.0.1", 3.0), ("u2", "10.0.0.2", 4.0))
      .toDF("_user", "_ip", "value")
    val recs = kinesisShape(events, "p", "click", "events-stream", 16).collect()
    assert(recs.forall(_.getString(0) == "events-stream"))
    // deterministic salt in [0, 16), reference key layout project|collection|salt
    assert(recs.forall { r =>
      val Array(pr, c, salt) = r.getString(1).split("\\|")
      pr == "p" && c == "click" && salt.toInt >= 0 && salt.toInt < 16
    })
    // source-only fields are excluded from the payload (EventStore contract)
    assert(recs.forall(!_.getString(2).contains("_ip")))
    assert(recs.exists(_.getString(2).contains("\"_user\":\"u1\"")))
  }

  test("property: any failure pattern conserves records — sent+dropped, no dupes") {
    val rng = new scala.util.Random(7)
    for (round <- 1 to 8) {
      val n = 1 + rng.nextInt(300)
      // random subset of values failing a random number of times (some
      // beyond the retry budget), random batch size
      val fails = (0 until n).filter(_ => rng.nextDouble() < 0.2)
        .map(i => s"v$i" -> (1 + rng.nextInt(5))).toMap
      val maxRetries = 1 + rng.nextInt(3)
      RecordingTransport.reset(fails = fails)
      val report = produce(shaped(n, parts = 1 + rng.nextInt(4)),
        () => RecordingTransport.make(),
        maxPerBatch = 1 + rng.nextInt(60), maxRetries = maxRetries)
      val delivered = RecordingTransport.sent.asScala.map(_._2.value).toSeq
      // every record is delivered exactly once or dropped — never both,
      // never twice (retries resend FAILED indexes only)
      assert(delivered.distinct.size == delivered.size,
        s"round $round: duplicate delivery")
      assert(report.nSent == delivered.size)
      assert(report.nSent + report.nDropped == n,
        s"round $round: ${report.nSent}+${report.nDropped} != $n")
      val expectDropped = fails.count(_._2 > maxRetries)
      assert(report.nDropped == expectDropped,
        s"round $round: dropped ${report.nDropped}, expected $expectDropped")
    }
  }

  test("a throwing transport is a failed attempt, not a dead Spark task") {
    // throws on the first call, works afterwards — a broker bounce
    val bounced = new java.util.concurrent.atomic.AtomicBoolean(false)
    RecordingTransport.reset()
    val flaky = () => new RecordTransport {
      def send(batch: IndexedSeq[ProducerRecord]): Seq[Int] =
        if (bounced.compareAndSet(false, true))
          throw new RuntimeException("connection reset")
        else RecordingTransport.make().send(batch)
    }
    val report = produce(shaped(10, parts = 1), flaky)
    // the whole first batch counts as one failed attempt, then retries
    assert(report == SendReport(10, 1, 10, 0, 0))
    // a transport that ALWAYS throws drops the batch after the budget
    RecordingTransport.reset()
    val dead = () => new RecordTransport {
      def send(batch: IndexedSeq[ProducerRecord]): Seq[Int] =
        throw new RuntimeException("no broker")
    }
    val dropped = produce(shaped(5, parts = 1), dead, maxRetries = 2)
    assert(dropped.nSent == 0 && dropped.nDropped == 5)
  }

  test("S9: kafkaRecords target the project_collection topic keyed by user") {
    val events = Seq(("u1", 1.0)).toDF("_user", "value")
    val rec = kafkaRecords(events, "p", "pageview").collect().head
    assert(rec.getString(0) == "p_pageview")
    assert(rec.getString(1) == "u1")
    assert(rec.getString(2).contains("\"value\":1.0"))
  }
}
