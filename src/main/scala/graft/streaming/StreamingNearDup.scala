package graft.streaming

import graft.analytics.DedupQueries
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (band, key) sighting of a document on the ingest stream. */
final case class BandedDoc(band: Int, key: String, doc_id: Long,
    ts: java.sql.Timestamp)

/** A candidate near-duplicate pair, emitted the moment the second
  * document of the pair arrives (doc1 < doc2). */
final case class NearDupCandidate(doc1: Long, doc2: Long)

/** Admitted members of one LSH band bucket — the whole per-bucket
  * state, bounded by the bucket cap. */
final case class BucketMembers(docIds: List[Long])

/** ST-dedup: streaming NEAR-duplicate detection — d2's MinHash-LSH
  * banding for a corpus that arrives continuously. StreamingDedup
  * answers "have I seen exactly this text"; this answers "have I seen
  * something LIKE it", online: each arriving document's band keys probe
  * the bucket state and candidate pairs come out as a stream, the shape
  * a dedup-at-ingest pipeline needs (drop/flag before the document ever
  * lands in the corpus).
  *
  * Scale posture mirrors batch d2 exactly: state per (band, key) bucket
  * is a capped id list (≤ cap longs — text never enters state), so a
  * viral duplicate cluster cannot grow a bucket past the cap; arrivals
  * at a full bucket emit nothing and are not admitted, which is
  * precisely the batch cap semantics (docs beyond the cap never join).
  * Band keys are computed SCAN-side by [[DedupQueries.bandStructs]] —
  * the same hash family and constants as the oracle-proven batch path —
  * so an ordered replay of the corpus emits exactly `d2From`'s candidate
  * set (StreamingNearDupSpec). Event-time timeout forgets buckets
  * `retentionMs` after their last sighting (the StreamingDedup
  * retention contract). */
object StreamingNearDup {

  /** Scan-side banding of a (doc_id, text, ts) stream. */
  def bandKeys(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"ts",
        explode(DedupQueries.bandStructs($"text")).as("bk"))
      .select($"bk.band".as("band"), $"bk.key".as("key"), $"doc_id", $"ts")
      .as[BandedDoc]
  }

  /** Candidate pairs from the banded stream. A pair that collides in
    * several bands is emitted once per band — `.dropDuplicates` (or the
    * consumer's own dedup state) distincts it, exactly like the batch
    * path's final `.distinct()`. */
  def candidates(banded: Dataset[BandedDoc],
      cap: Int = DedupQueries.BucketCap, retentionMs: Long = Long.MaxValue / 4,
      delay: String = "0 seconds"): Dataset[NearDupCandidate] = {
    import banded.sparkSession.implicits._
    banded
      .withWatermark("ts", delay)
      .groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState[BucketMembers, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, String), incoming: Iterator[BandedDoc],
            state: GroupState[BucketMembers]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // micro-batches are unordered: admit by (ts, doc_id) — the
            // replay order under which stream ≡ batch holds
            val batch = incoming.toSeq.sortBy(b => (b.ts.getTime, b.doc_id))
            var members = state.getOption.getOrElse(BucketMembers(Nil)).docIds
            val out = Seq.newBuilder[NearDupCandidate]
            batch.foreach { b =>
              if (!members.contains(b.doc_id) && members.size < cap) {
                members.foreach { m =>
                  out += NearDupCandidate(math.min(m, b.doc_id),
                    math.max(m, b.doc_id))
                }
                members = b.doc_id :: members
              }
            }
            state.update(BucketMembers(members))
            val lastSeen = batch.lastOption.map(_.ts.getTime)
              .getOrElse(state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(math.max(
              // clamp above the watermark (Spark rejects at-or-below)
              lastSeen saturatingAdd retentionMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  private implicit final class SatLong(private val a: Long) extends AnyVal {
    def saturatingAdd(b: Long): Long = {
      val s = a + b
      if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s
    }
  }
}
