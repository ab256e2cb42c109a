package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.MapType

/** S13/M6: the webhook forward sink with the reference's full contract
  * (WebhookEventMapper.java:62-168):
  *
  *  - events queue up and flush periodically (the 5 s scheduled drain →
  *    a ProcessingTime trigger);
  *  - each flush POSTs ONE JSON payload `{"activities": [event, …]}`;
  *  - MAP-typed columns are dropped from the payload (the reference
  *    skips map fields when building activity JSON);
  *  - a failed POST is retried up to [[MaxRetries]] more times, then the
  *    batch is dropped with the failure surfaced (the reference logs and
  *    moves on — a webhook must never dam the pipeline).
  *
  * `post` abstracts the HTTP transport (no egress in this environment);
  * it returns true on 2xx. Payload assembly is executor-light: the
  * activities are collected per micro-batch, which is bounded by the
  * subscription's filter — the side-channel contract, not the event
  * firehose.
  */
object WebhookSink {

  val MaxRetries = 2
  val FlushPeriod = "5 seconds"

  final case class FlushReport(batchId: Long, nActivities: Long,
      attempts: Int, delivered: Boolean)

  /** One micro-batch → the `{"activities": [...]}` payload. */
  def payload(batch: DataFrame): String = {
    val noMaps = batch.schema.fields
      .filterNot(_.dataType.isInstanceOf[MapType]).map(f => col(f.name))
    val acts = batch.select(noMaps.toIndexedSeq: _*).toJSON.collect()
    acts.mkString("{\"activities\":[", ",", "]}")
  }

  /** POST with retry ×[[MaxRetries]]; returns (attempts, delivered). */
  def postWithRetry(post: String => Boolean, body: String): (Int, Boolean) = {
    var attempt = 0
    while (attempt <= MaxRetries) {
      attempt += 1
      val ok = try post(body) catch { case _: Exception => false }
      if (ok) return (attempt, true)
    }
    (attempt, false)
  }

  /** Attach the sink to a (filtered, projected) subscription stream.
    * `onFlush` observes each flush's outcome (metrics/yards for tests —
    * the reference counts these into its ingest metrics, A3). */
  def attach(stream: DataFrame, post: String => Boolean,
      period: String = FlushPeriod)(
      onFlush: FlushReport => Unit = _ => ()): DataStreamWriter[Row] =
    Subscriptions.sideOutput(stream, period) { (df, batchId) =>
      val n = df.count()
      if (n > 0) {
        val (attempts, ok) = postWithRetry(post, payload(df))
        onFlush(FlushReport(batchId, n, attempts, ok))
      }
    }
}
