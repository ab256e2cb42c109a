package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) storage for the big-big join pairs — the
  * SURVEY §4 "bucketing for co-located joins" posture, concretely:
  *
  * The event↔profile join (J4) is the one big-big join an analytics
  * deployment runs constantly; both sides key on the user. Writing both
  * tables bucketed AND sorted by that key pins rows with equal keys to
  * equal bucket files, so the join planner proves co-partitioning from
  * the catalog and skips BOTH shuffles (and with sorted buckets, both
  * sorts): at 100 TB that's the difference between re-shuffling the
  * event store on every dashboard query and a scan-local merge join.
  *
  * Bucket count is a layout decision: pick ≥ the cluster's target
  * parallelism at the table's full size (buckets are the max join
  * parallelism without AQE splitting), and keep it identical on both
  * sides — mismatched counts fall back to shuffling the smaller side.
  */
object BucketedStore {

  /** Write `df` bucketed + sorted by `key` as managed table `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key — planner
    * proves co-location, no Exchange on either side. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
