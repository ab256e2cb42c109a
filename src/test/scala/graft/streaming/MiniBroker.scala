package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Test-scope in-JVM commit-log broker with Kafka's observable
  * semantics — the strongest store→stream wire pin this offline sandbox
  * permits (no broker binary, no spark-sql-kafka connector jar ships
  * here; see Subscriptions.kafkaStream's honesty note):
  *
  *  - topics with a fixed partition count; records route by Kafka's
  *    DEFAULT partitioner — murmur2 over the serialized key,
  *    `toPositive(hash) % numPartitions` (the public algorithm from the
  *    Kafka client's `Utils.murmur2`/`DefaultPartitioner`), so per-key
  *    placement matches what a real producer would do;
  *  - offsets are per-partition, contiguous, monotonic — append returns
  *    the assigned offset;
  *  - `truncateBefore` models retention aging-out: the log-start offset
  *    advances, and a consumer resuming from below it hits the
  *    `failOnDataLoss` contract — throw by default (the ST3 default this
  *    engine pins), or skip to log-start with the count of lost records
  *    when the tail explicitly opted out.
  *
  * Brokers register in a static map so executor threads (same JVM at
  * local[*]) reach them through a serializable id — the
  * RecordProducersSpec transport convention.
  */
final class MiniBroker(val numPartitions: Int = 4) extends Serializable {
  import MiniBroker._

  private val logs = TrieMap.empty[(String, Int), ArrayBuffer[Rec]]
  private val logStart = TrieMap.empty[(String, Int), Long]

  def partitionFor(key: String): Int =
    (murmur2(key.getBytes("UTF-8")) & 0x7fffffff) % numPartitions

  /** Produce one record; returns (partition, assigned offset). */
  def append(topic: String, key: String, value: String): (Int, Long) =
    synchronized {
      val p = partitionFor(key)
      val log = logs.getOrElseUpdate((topic, p), ArrayBuffer.empty)
      val offset = logStart.getOrElse((topic, p), 0L) + log.length
      log += Rec(key, value, offset, System.currentTimeMillis())
      (p, offset)
    }

  /** Retention aging-out: drop everything below `offset` and advance
    * the log-start offset. */
  def truncateBefore(topic: String, partition: Int, offset: Long): Unit =
    synchronized {
      val k = (topic, partition)
      val start = logStart.getOrElse(k, 0L)
      if (offset > start) {
        logs.get(k).foreach(log => log.remove(0, (offset - start).toInt))
        logStart(k) = offset
      }
    }

  def startOffset(topic: String, partition: Int): Long =
    logStart.getOrElse((topic, partition), 0L)

  def endOffset(topic: String, partition: Int): Long =
    startOffset(topic, partition) +
      logs.get((topic, partition)).map(_.length.toLong).getOrElse(0L)

  /** Consumer fetch from `from` — the failOnDataLoss seam: resuming
    * below the log-start offset is DATA LOSS (retention outran the
    * consumer). `failOnDataLoss=true` (the engine's ST3 default) kills
    * the tail; `false` skips to log-start and reports how many records
    * were silently lost, which is exactly what the connector logs. */
  def fetch(topic: String, partition: Int, from: Long,
      failOnDataLoss: Boolean = true): (Seq[Rec], Long) = synchronized {
    val start = startOffset(topic, partition)
    if (from < start) {
      if (failOnDataLoss)
        throw new DataLossException(
          s"offsets [$from, $start) aged out of $topic-$partition")
      val lost = start - from
      (logs.get((topic, partition)).map(_.toSeq).getOrElse(Seq.empty), lost)
    } else {
      val recs = logs.get((topic, partition)).map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.offset >= from)
      (recs, 0L)
    }
  }

  def topics: Seq[String] = logs.keys.map(_._1).toSeq.distinct.sorted

  /** Everything in the broker as connector-shaped rows:
    * (topic, partition, offset, key, value, timestamp). */
  def allRecords: Seq[(String, Int, Long, String, String, Long)] =
    synchronized {
      logs.toSeq.flatMap { case ((t, p), log) =>
        log.map(r => (t, p, r.offset, r.key, r.value, r.timestamp))
      }
    }
}

object MiniBroker {
  final case class Rec(key: String, value: String, offset: Long, timestamp: Long)

  final class DataLossException(msg: String) extends RuntimeException(msg)

  /** Static registry: a serializable id crosses the task-closure
    * boundary; the broker never does. */
  private val registry = TrieMap.empty[String, MiniBroker]
  def register(id: String, b: MiniBroker): Unit = registry(id) = b
  def get(id: String): MiniBroker = registry(id)

  /** Kafka's `Utils.murmur2` — the hash behind the default partitioner
    * (public Apache Kafka client algorithm; seed 0x9747b28c). */
  def murmur2(data: Array[Byte]): Int = {
    val length = data.length
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ length
    val length4 = length / 4
    var i = 0
    while (i < length4) {
      val i4 = i * 4
      var k = (data(i4 + 0) & 0xff) + ((data(i4 + 1) & 0xff) << 8) +
        ((data(i4 + 2) & 0xff) << 16) + ((data(i4 + 3) & 0xff) << 24)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val tail = length & ~3
    if ((length % 4) >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if ((length % 4) >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if ((length % 4) >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }
}
