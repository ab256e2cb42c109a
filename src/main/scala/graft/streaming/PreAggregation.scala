package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-query pre-aggregation — the reference's
  * `PreCalculateQuery(collection, dimension)` contract
  * (AbstractUserService.java:77-86; "continuous queries" in the product
  * docs): a segmentation table maintained incrementally by Structured
  * Streaming and queryable by batch SQL at any time.
  *
  * The maintained table is the A4 segmentation grain — (day, dimension)
  * → event count + distinct users — so dashboard queries hit the tiny
  * pre-aggregate instead of the event store.
  *
  * Distinct users: streaming doesn't support COUNT(DISTINCT), so the
  * exact variant carries `collect_set(user)` state (bounded by users per
  * (day, dimension) group — fine for per-dimension grains) and the
  * `approx = true` variant uses HyperLogLog state (the 100 TB
  * configuration; ±2% and O(1) state per group).
  *
  * Materialization: complete-mode memory sink here (the pre-aggregate is
  * groups-bounded, not events-bounded); on a cluster the same DataFrame
  * goes through `foreachBatch` + MERGE into a warehouse table keyed by
  * (day, dimension) — the plan underneath is identical.
  */
final case class PreCalculateQuery(
    collection: Option[String], dimension: String)

object PreAggregation {

  /** The incrementally-maintained segmentation plan over a streaming
    * events DataFrame (needs `_collection`, `_time`, `_user`, and the
    * dimension column). Also correct over a batch DataFrame — the spec
    * uses that to prove stream ≡ batch. */
  def segmentation(events: DataFrame, pre: PreCalculateQuery,
      approx: Boolean = false): DataFrame = {
    val base = pre.collection
      .map(c => events.filter(col("_collection") === c))
      .getOrElse(events)
    val distinctUsers =
      if (approx) approx_count_distinct(col("_user")).as("n_users")
      else size(collect_set(col("_user"))).cast("long").as("n_users")
    base
      .groupBy(
        date_trunc("day", col("_time")).as("day"),
        col(pre.dimension).as("dimension"))
      .agg(count(lit(1)).as("n_events"), distinctUsers)
  }

  /** The A3 ingest-metrics contract maintained continuously — the
    * reference counts ingested events per project/collection as the
    * stream flows (S3BulkEventStore.java:145-150 bumps its metric
    * registry per stored batch; it never re-scans). Per collection:
    * volume, distinct users (exact set state or HLL — same trade as
    * [[segmentation]]), payload bytes, and the ingest time span.
    * min/max/sum/count are all mergeable, so complete-mode state is one
    * row per collection. Also correct over a batch frame — the spec
    * proves stream ≡ batch on replay. */
  def ingestMetrics(events: DataFrame, approx: Boolean = false): DataFrame = {
    val distinctUsers =
      if (approx) approx_count_distinct(col("_user")).as("n_users")
      else size(collect_set(col("_user"))).cast("long").as("n_users")
    events
      .groupBy(col("_collection").as("collection"))
      .agg(
        count(lit(1)).as("n_events"),
        distinctUsers,
        sum(length(col("_payload")).cast("long")).as("payload_bytes"),
        min(col("_time")).as("first_ts"),
        max(col("_time")).as("last_ts"))
  }

  /** Start maintaining the pre-aggregate under `name`; read it back any
    * time with `spark.table(name)`. Call `processAllAvailable()` (or let
    * the trigger run) to fold new micro-batches in. */
  def materialize(pre: DataFrame, name: String): StreamingQuery =
    pre.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
}
