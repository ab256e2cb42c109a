package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One incoming document on the ingest stream, pre-hashed (the content
  * hash is computed scan-side — `md5`/`xxhash64` — so the stateful
  * operator only ever carries 8-byte-ish keys, never text). */
final case class StreamDoc(content_hash: String, doc_id: Long,
    ts: java.sql.Timestamp)

/** Emitted per incoming doc: kept (first occurrence of its content) or
  * dropped as a duplicate of `canonical_id`. */
final case class DedupVerdict(content_hash: String, doc_id: Long,
    kept: Boolean, canonical_id: Long)

/** ST-dedup: streaming EXACT dedup — the d1 operator for a corpus that
  * arrives continuously instead of sitting in a warehouse. The built-in
  * `dropDuplicatesWithinWatermark` silently discards duplicates; a
  * training-data pipeline needs the VERDICT stream instead (which doc
  * was kept, what it duplicated) to build its provenance/audit table,
  * so this keeps explicit state: one record per distinct content hash
  * holding the canonical (first, by event time then doc_id) document id.
  *
  * Scale posture: state is keyed by content hash — one small record per
  * DISTINCT document ever seen inside the retention window, partitioned
  * across executors by the state store. The event-time timeout bounds
  * state to `retention` behind the watermark: an unbounded-history
  * variant is a policy choice (no timeout), not a different operator.
  * Batch parity: a commit-log replay (log order, monotone event time)
  * yields exactly d1's (hash → canonical = min doc_id) — asserted in
  * StreamingDedupSpec. Replays must carry monotone event time or run
  * with a `delay` covering the replay span: once the watermark advances,
  * rows at-or-before it are dropped before the stateful operator ever
  * sees them (standard watermark semantics, easy to trip on a replay
  * that stamps every row with the same timestamp).
  */
object StreamingDedup {

  def dedup(docs: Dataset[StreamDoc], retentionMs: Long,
      delay: String = "0 seconds"): Dataset[DedupVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", delay)
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[CanonicalDoc, DedupVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hash: String, incoming: Iterator[StreamDoc],
            state: GroupState[CanonicalDoc]) =>
          if (state.hasTimedOut) {
            // retention passed with no new copy: forget the hash (a later
            // re-arrival will be treated as a fresh canonical — the
            // documented retention contract)
            state.remove()
            Iterator.empty
          } else {
            // micro-batches are unordered: take first by (ts, doc_id)
            val batch = incoming.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))
            var canon = state.getOption
            val out = Seq.newBuilder[DedupVerdict]
            batch.foreach { d =>
              canon match {
                case None =>
                  canon = Some(CanonicalDoc(d.doc_id, d.ts.getTime))
                  out += DedupVerdict(hash, d.doc_id, kept = true, d.doc_id)
                case Some(c) =>
                  out += DedupVerdict(hash, d.doc_id, kept = false, c.docId)
              }
            }
            canon.foreach { c =>
              state.update(c)
              // keep the hash for `retention` past the latest sighting;
              // clamp above the watermark (Spark rejects a timeout at or
              // below it — same clamp FunnelState uses)
              val lastSeen = batch.lastOption.map(_.ts.getTime).getOrElse(c.firstMs)
              state.setTimeoutTimestamp(
                math.max(lastSeen + retentionMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }
}

/** The per-hash state record: the canonical doc and when it was first
  * seen. Deliberately tiny — state size is what bounds a streaming
  * dedup at scale. */
final case class CanonicalDoc(docId: Long, firstMs: Long)
