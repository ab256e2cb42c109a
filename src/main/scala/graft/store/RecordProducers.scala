package graft.store

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Executor-side producer drain for the commit-log sinks (S9 Kafka, S10
  * Kinesis) — the write path between the shaped record frames
  * ([[StreamSinks.kafkaShape]] / [[StreamSinks.saltedShards]]) and a
  * partitioned log.
  *
  * The transport itself is a seam: this sandbox ships neither a Kafka
  * broker nor the AWS SDK, so `RecordTransport` abstracts exactly the
  * one call both producers make — "send this batch, tell me which
  * records failed" (the kinesis putRecords / KPL flush contract,
  * AWSKinesisEventStore.java:85-117; the kafka send loop,
  * KafkaEventStore.java:82-108). Everything that is OURS — executor-side
  * batching, per-record size guard, failed-index retry, in-order
  * delivery per source partition, bounded driver reporting — is real and
  * spec-exercised; only the socket is faked.
  *
  * Scale posture: the drain is `mapPartitions`, one transport per task,
  * O(maxPerBatch) records in flight per task, and the driver sees only
  * per-partition counters (O(partitions), never records).
  */
object RecordProducers {

  /** One wire record: target log (topic / stream), partition key,
    * serialized payload. */
  final case class ProducerRecord(target: String, key: String, value: String)

  /** The transport seam. `send` returns the indexes (into the batch)
    * that FAILED — empty means all delivered. Implementations must be
    * constructible executor-side via the factory passed to [[produce]]
    * (a real KafkaProducer / KinesisClient is not serializable; the
    * factory is). */
  trait RecordTransport {
    def send(batch: IndexedSeq[ProducerRecord]): Seq[Int]
  }

  /** Per-record payload cap — the reference rejects events whose
    * serialized size exceeds 1 MB (AWSKinesisEventStore.java:98-101);
    * kinesis enforces the same limit per putRecords entry. Oversized
    * records are counted as rejected, never sent. */
  val MaxRecordBytes: Int = 1048576

  /** Kinesis putRecords accepts at most 500 records per call; the kafka
    * producer batches internally but the drain uses the same bound so
    * one failing batch retries a bounded slice. */
  val MaxPerBatch: Int = 500

  /** Matches the reference's bulk-upload retry count
    * (AWSKinesisEventStore.java:126 `upload(project, events, 3)`). */
  val MaxRetries: Int = 3

  /** Aggregate delivery report: counters only — the driver-side
    * footprint is O(1) regardless of batch size. */
  final case class SendReport(
      nSent: Long, nBatches: Long, nRetriedRecords: Long,
      nDropped: Long, nRejectedOversize: Long) {
    def +(o: SendReport): SendReport = SendReport(
      nSent + o.nSent, nBatches + o.nBatches,
      nRetriedRecords + o.nRetriedRecords, nDropped + o.nDropped,
      nRejectedOversize + o.nRejectedOversize)
  }
  object SendReport { val zero: SendReport = SendReport(0, 0, 0, 0, 0) }

  /** Drain a shaped frame (columns `target`, `key`, `value`) through the
    * transport, executor-side:
    *
    *  - records keep their source-partition order (per-key ordering is
    *    preserved for any key that stays inside one Spark partition —
    *    which [[StreamSinks.kafkaShape]]'s `_user` key does when the
    *    upstream is partitioned by user, and the salted kinesis key
    *    gives up by design, AWSKinesisEventStore.java:148-160);
    *  - records over [[MaxRecordBytes]] are rejected up front (counted,
    *    not sent) — the reference's 1 MB guard;
    *  - each batch of ≤ `maxPerBatch` sends, then ONLY the failed
    *    indexes re-send, up to `maxRetries` times; survivors are dropped
    *    and counted (the reference logs and moves on — a sink must not
    *    dam the pipeline).
    */
  def produce(shaped: DataFrame, transport: () => RecordTransport,
      maxPerBatch: Int = MaxPerBatch,
      maxRetries: Int = MaxRetries): SendReport = {
    val reports = shaped.select(col("target"), col("key"), col("value"))
      .rdd.mapPartitions { it =>
        val t = transport()
        var report = SendReport.zero
        it.map(rowRecord).grouped(maxPerBatch).foreach { chunk =>
          val (oversize, fit) = chunk.partition(
            _.value.getBytes("UTF-8").length > MaxRecordBytes)
          // a transport that THROWS (connection reset, broker bounce)
          // is a failed attempt for the whole batch, not a dead Spark
          // task — the reference logs and moves on (a sink must never
          // dam the pipeline); the batch retries like any other failure
          def trySend(b: IndexedSeq[ProducerRecord]): Seq[Int] =
            try t.send(b) catch { case _: Exception => b.indices }
          var batch = fit.toIndexedSeq
          var attempt = 0
          var failed = if (batch.isEmpty) Seq.empty[Int] else trySend(batch)
          while (failed.nonEmpty && attempt < maxRetries) {
            report = report.copy(
              nRetriedRecords = report.nRetriedRecords + failed.size)
            batch = failed.map(batch).toIndexedSeq
            failed = trySend(batch)
            attempt += 1
          }
          report = report.copy(
            nSent = report.nSent + (fit.size - failed.size),
            nBatches = report.nBatches + (if (fit.nonEmpty) 1 else 0),
            nDropped = report.nDropped + failed.size,
            nRejectedOversize = report.nRejectedOversize + oversize.size)
        }
        Iterator(report)
      }.collect()
    reports.foldLeft(SendReport.zero)(_ + _)
  }

  private def rowRecord(r: Row): ProducerRecord = ProducerRecord(
    r.getString(0),
    Option(r.getString(1)).getOrElse(""),
    r.getString(2))

  /** S10: the salted kinesis record frame — stream as target, the
    * deterministic `project|collection|salt` shard key, payload without
    * source-only fields — ready for [[produce]]. */
  def kinesisShape(df: DataFrame, project: String, collection: String,
      stream: String, saltRange: Int): DataFrame = {
    val payload = df.drop(EventStore.sourceOnlyFields: _*)
    StreamSinks.saltedShards(payload, project, collection, saltRange)
      .select(
        lit(stream).as("target"),
        col("_shard_key").as("key"),
        to_json(struct(payload.columns.map(col).toIndexedSeq: _*)).as("value"))
  }

  /** S9: [[StreamSinks.kafkaShape]] renamed to the produce contract. */
  def kafkaRecords(df: DataFrame, project: String, collection: String): DataFrame =
    StreamSinks.kafkaShape(df, project, collection)
      .withColumnRenamed("topic", "target")
}
