package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming restatement of the reference's continuous
  * surfaces (SURVEY.md §2.9):
  *
  *  - ST1 subscriptions (EventStream.java:7-17,
  *    CollectionStreamQuery.java:20-39): a per-subscriber filtered,
  *    projected tail of one or more collections. The filter is a SQL
  *    predicate parsed by Catalyst — exactly the contract the reference
  *    exposes; `sync()` pulls map to micro-batch triggers.
  *  - ST4/ST5 watermarked event-time windows.
  *  - ST6 stateful dedup by the API-context uuid (Event.java:154).
  *  - ST7 periodic side-output flush (WebhookEventMapper 5 s queue) as
  *    a ProcessingTime-triggered foreachBatch.
  *
  * Offsets (ST3) ride on Spark checkpointing: each subscription gets a
  * checkpoint dir keyed by subscription id, making it a restartable
  * query — the ZK offset store of the reference collapses into this.
  */
final case class CollectionStreamQuery(collection: String, filter: Option[String])

final case class StreamSubscription(
    id: String,
    queries: Seq[CollectionStreamQuery],
    columns: Seq[String] = Seq.empty)

object Subscriptions {

  /** Build the subscription DataFrame over a streaming source of events
    * carrying a `_collection` column: per-collection filters OR'd
    * (P3), optional projection (P4). */
  def plan(stream: DataFrame, sub: StreamSubscription): DataFrame = {
    val pred = sub.queries.map { q =>
      val base = col("_collection") === q.collection
      q.filter.map(f => base && expr(f)).getOrElse(base)
    }.reduce(_ || _)
    val filtered = stream.filter(pred)
    if (sub.columns.nonEmpty)
      filtered.select(sub.columns.map(col).toIndexedSeq: _*)
    else filtered
  }

  /** File-source event stream (the commit-log tail, ST2): new files in
    * `dir` are the micro-batches. Prefer [[manifestStream]] for store
    * tables — tailing the table directory directly re-delivers a
    * compaction's rewritten part files as fresh rows. */
  def fileStream(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Manifest-aware tail of a store table (the Kafka-offset semantics
    * the reference gets from KafkaOffsetManager.java:24-90, restated on
    * the [[graft.store.TableManifest]] commit log): the subscription
    * tails a private spool that [[graft.store.ManifestTail.advance]]
    * fills with exactly the files append-only commits ADDED — a
    * compaction or erasure rewrite under a live tail contributes
    * nothing, so no duplicate delivery, ever. Call `advance` (returned)
    * before each sync pull, or on a timer for continuous queries. */
  def manifestStream(spark: SparkSession, schema: StructType, table: String,
      subId: String): (DataFrame, () => Long) = {
    val spool = graft.store.ManifestTail.spoolDir(table, subId)
    // initial head snapshot; thereafter each advance passes the last
    // delivered version so a spool that VANISHED under this live
    // subscription (swept as stale, deleted out-of-band) poisons
    // instead of silently refilling — the refill would re-deliver
    // files compacted since `last` under new paths
    var last = graft.store.ManifestTail.advance(table, spool)
    (fileStream(spark, schema, spool.getAbsolutePath),
      () => spool.synchronized {
        val v = graft.store.ManifestTail.advance(table, spool, Some(last))
        last = v
        v
      })
  }

  /** ST2: the Kafka commit-log tail. The reference writes each event to
    * a `{project}_{collection}` topic and tails topics from stored
    * offsets (KafkaEventStore.java:82-101, offsets in ZK — here they ride
    * on the query checkpoint like every other subscription).
    *
    * HONESTY NOTE: this sandbox ships no spark-sql-kafka connector jar
    * and no broker, so `.load()` cannot run here. What IS exercised:
    * the exact reader configuration this builder emits ([[kafkaOptions]],
    * KafkaTailSpec) and the full store→stream round-trip minus only the
    * socket (KafkaWireSpec) — the real producer drain into an in-JVM
    * broker with Kafka's observable semantics (murmur2 default
    * partitioner, per-partition contiguous offsets, retention
    * truncation + the failOnDataLoss contract), decoded back through
    * [[decodeKafka]]. */
  /** `failOnDataLoss` defaults TRUE: a lost-offset range (aged-out
    * retention, deleted topic) kills the query instead of silently
    * skipping records — for a commit-log tail feeding incremental
    * indexes, a silent gap is data corruption. `false` is the explicit
    * opt-out for tails that prefer liveness over completeness. */
  final case class KafkaTail(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true)

  /** The spark-sql-kafka source options for a tail — one place, so the
    * spec can pin them without a broker. */
  def kafkaOptions(t: KafkaTail): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> t.bootstrapServers,
      "subscribe" -> t.topics.mkString(","),
      "startingOffsets" -> t.startingOffsets,
      "failOnDataLoss" -> t.failOnDataLoss.toString
    ) ++ t.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** The one-line load — requires the spark-sql-kafka connector on the
    * classpath (absent here; see the honesty note above). */
  def kafkaStream(spark: SparkSession, t: KafkaTail): DataFrame =
    spark.readStream.format("kafka").options(kafkaOptions(t)).load()

  /** Kafka wire record → the subscription event frame. Input has the
    * connector's fixed schema (key/value binary, topic, partition,
    * offset, timestamp); output is `_collection` (from the reference's
    * `{project}_{collection}` topic layout), the typed event columns
    * (`from_json` over the registry schema — the streaming twin of the
    * batch typed parse), and partition/offset for at-least-once
    * bookkeeping. Works identically on a static frame, which is how the
    * spec drives it without a broker. */
  def decodeKafka(records: DataFrame, project: String,
      valueSchema: StructType): DataFrame = {
    val collection = regexp_replace(col("topic"),
      lit("^" + java.util.regex.Pattern.quote(project + "_")), lit(""))
    records
      .filter(col("topic").startsWith(project + "_"))
      .select(
        collection.as("_collection"),
        from_json(col("value").cast("string"), valueSchema).as("_event"),
        col("partition").as("_kafka_partition"),
        col("offset").as("_kafka_offset"))
      .select(col("_collection"), col("_event.*"),
        col("_kafka_partition"), col("_kafka_offset"))
  }

  /** Stream-stream time-bounded join: attach each right-stream event to
    * left-stream events of the same key within `[left.ts, left.ts +
    * window]` — the streaming twin of the batch as-of/interval family
    * (j5/j9). Both sides carry watermarks, so Spark's state store holds
    * only rows younger than `watermark + window` per side — the bounded
    * configuration of stream-stream joins (an un-watermarked join's
    * state grows forever). Left frame needs (key, l_ts, ...), right
    * (key, r_ts, ...); inner join, so unmatched rows age out silently. */
  def timeBoundedJoin(left: DataFrame, right: DataFrame,
      key: String, window: String, watermark: String): DataFrame = {
    val l = left.withWatermark("l_ts", watermark)
    val r = right.withWatermark("r_ts", watermark)
    l.join(r,
      l(key) === r(key) &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .drop(r(key))
  }

  /** ST6: drop duplicate deliveries by uuid within the watermark —
    * state is bounded by the delay, the 100 TB-safe configuration of
    * dropDuplicates. */
  def dedup(stream: DataFrame, uuidCol: String, tsCol: String,
      delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(uuidCol)

  /** ST5: watermarked tumbling event-time aggregation (the streaming
    * twin of the batch A4 segmentation). */
  def windowedCounts(stream: DataFrame, tsCol: String, typeCol: String,
      window_ : String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** ST5: session windows — gap-based per-user sessions over event time
    * (the anonymous-session semantics of UserIdEventMapper.java:50-72,
    * expressed with Spark's native `session_window` so state closes as
    * the watermark passes each session's gap). The batch twin is the W2
    * sessionization window formulation — same session boundaries. */
  def sessionAgg(stream: DataFrame, tsCol: String, userCol: String,
      gap: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** ST7: webhook-style side output — batch callback every `period`
    * (WebhookEventMapper.java:62-168's 5-second queue flush). */
  def sideOutput(stream: DataFrame, period: String)(
      f: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(period))
      .foreachBatch((df: DataFrame, id: Long) => f(df, id))

  /** Run a subscription to a named in-memory sink and process all
    * available input once (the `sync()` pull of EventStream.java:13). */
  def syncOnce(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    q.processAllAvailable()
    q
  }
}
