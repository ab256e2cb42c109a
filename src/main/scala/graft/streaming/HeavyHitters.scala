package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One observed item (event type, page, search term, …). */
final case class HHItem(item: String)

/** One tracked counter: `count` never undercounts the item's true
  * frequency, and `count - err` never overcounts it. */
final case class HHCounter(item: String, count: Long, err: Long)

/** Per-shard state: items processed and the capacity-bounded counters. */
final case class HHState(n: Long, counters: Map[String, HHCounter])

/** Current summary of one shard, emitted per trigger; `n` is monotone,
  * so "latest summary" = max-n row per shard. */
final case class HHSummary(shard: Int, n: Long, counters: Seq[HHCounter])

/** ST-state: streaming heavy hitters (top-k over an unbounded stream)
  * via the SpaceSaving summary (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT'05) — the
  * "what's trending right now" dashboard the reference serves from its
  * continuous queries, answerable with STATE BOUNDED BY CAPACITY, not
  * by vocabulary (an exact streaming groupBy(item).count holds every
  * item ever seen).
  *
  * Distribution: items hash to [[shardOf]] shards; each shard's
  * `mapGroupsWithState` keeps one SpaceSaving summary of `capacity`
  * counters for ITS items only (an item lives in exactly one shard, so
  * per-shard guarantees are global for that item):
  *
  *   - estimate ≥ true count      (never undercounts),
  *   - estimate − err ≤ true count (err bounds the overcount),
  *   - any item with true count > n_shard / capacity is tracked.
  *
  * Both proven against exact batch counts in HeavyHittersSpec. Counter
  * eviction picks the minimum (count, item) — deterministic under
  * micro-batch replay given the per-batch fold order (sorted below). */
object HeavyHitters {

  /** Shard assignment — exposed so callers (and the spec) can compute
    * per-shard stream sizes. */
  def shardOf(item: String, shards: Int): Int =
    math.floorMod(item.hashCode, shards)

  private def update(s: HHState, item: String, capacity: Int): HHState = {
    val n = s.n + 1
    s.counters.get(item) match {
      case Some(c) =>
        HHState(n, s.counters.updated(item, c.copy(count = c.count + 1)))
      case None if s.counters.size < capacity =>
        HHState(n, s.counters.updated(item, HHCounter(item, 1L, 0L)))
      case None =>
        // evict the deterministic minimum; the newcomer inherits its
        // count as the error bound (the SpaceSaving replacement rule)
        val victim = s.counters.values.minBy(c => (c.count, c.item))
        HHState(n, (s.counters - victim.item)
          .updated(item, HHCounter(item, victim.count + 1, victim.count)))
    }
  }

  /** Track top items with ≤ `capacity` counters per shard. Run with
    * `outputMode("update")`; each trigger emits the touched shards'
    * current summaries (counters sorted by decreasing estimate). */
  def track(items: Dataset[HHItem], capacity: Int,
      shards: Int): Dataset[HHSummary] = {
    import items.sparkSession.implicits._
    require(capacity > 0 && shards > 0)
    items
      .groupByKey(e => shardOf(e.item, shards))
      .mapGroupsWithState[HHState, HHSummary](GroupStateTimeout.NoTimeout) {
        (shard: Int, evs: Iterator[HHItem], state: GroupState[HHState]) =>
          var s = state.getOption.getOrElse(HHState(0L, Map.empty))
          // micro-batches are unordered; fix a fold order so replays of
          // the same batch rebuild the same summary
          evs.toSeq.sortBy(_.item).foreach(e => s = update(s, e.item, capacity))
          state.update(s)
          HHSummary(shard, s.n,
            s.counters.values.toSeq.sortBy(c => (-c.count, c.item)))
      }
  }
}
