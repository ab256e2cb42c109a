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

  /** Driver-side cap per POST. The reference drains a *snapshot* of its
    * queue each 5 s tick (WebhookEventMapper.java:62-124 snapshots
    * `counter`, polls that many); arrivals during the drain wait for the
    * next tick, so no single drain materializes an unbounded buffer. A
    * micro-batch has no next tick to lean on — a backfilled replay can
    * hand one flush millions of rows — so the flush streams the batch
    * through the driver in chunks of this size, one POST per chunk. */
  val MaxFlushActivities = 10000

  final case class FlushReport(batchId: Long, nActivities: Long,
      attempts: Int, delivered: Boolean, chunk: Int = 0)

  /** Activity JSON lines: MAP-typed columns dropped (the reference skips
    * map fields when building activity JSON). */
  private def activityJson(batch: DataFrame) = {
    val noMaps = batch.schema.fields
      .filterNot(_.dataType.isInstanceOf[MapType]).map(f => col(f.name))
    batch.select(noMaps.toIndexedSeq: _*).toJSON
  }

  /** One micro-batch → the `{"activities": [...]}` payload (unbounded —
    * test/shape helper; the attached sink uses the chunked drain). */
  def payload(batch: DataFrame): String =
    activityJson(batch).collect().mkString("{\"activities\":[", ",", "]}")

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
    * the reference counts these into its ingest metrics, A3).
    *
    * The batch is drained through `toLocalIterator` in chunks of
    * `maxPerPost`: the driver holds at most one chunk (plus one fetched
    * partition) at a time, each chunk POSTs and retries independently,
    * and the remainder carries over to the next chunk — bounded driver
    * memory no matter how large a replayed micro-batch is. */
  def attach(stream: DataFrame, post: String => Boolean,
      period: String = FlushPeriod, maxPerPost: Int = MaxFlushActivities)(
      onFlush: FlushReport => Unit = _ => ()): DataStreamWriter[Row] =
    Subscriptions.sideOutput(stream, period) { (df, batchId) =>
      val it = activityJson(df).toLocalIterator()
      var chunk = 0
      while (it.hasNext) {
        val buf = new StringBuilder("{\"activities\":[")
        var n = 0
        while (it.hasNext && n < maxPerPost) {
          if (n > 0) buf.append(',')
          buf.append(it.next())
          n += 1
        }
        buf.append("]}")
        val (attempts, ok) = postWithRetry(post, buf.toString)
        onFlush(FlushReport(batchId, n, attempts, ok, chunk))
        chunk += 1
      }
    }
}
