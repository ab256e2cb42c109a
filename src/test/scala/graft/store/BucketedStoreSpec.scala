package graft.store

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides of the event↔profile join
  * written bucketed+sorted by user key → the join plans with ZERO
  * exchanges (and zero sorts, thanks to sortBy). */
class BucketedStoreSpec extends SparkSpec {

  test("bucketed event/profile tables join without any shuffle") {
    val events = Tables(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("value"))
    val profiles = Tables(spark, sf(), "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))

    BucketedStore.writeBucketed(events, "bk_events", "user_id", 8)
    BucketedStore.writeBucketed(profiles, "bk_profiles", "user_id", 8)
    // at test scale AQE would broadcast the tiny side (also shuffle-free,
    // but that proves nothing about bucketing) — force the big-big path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedStore.colocatedJoin(spark, "bk_events", "bk_profiles", "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") || l.contains("ShuffleExchange"))
      assert(shuffles == 0,
        s"bucketed join must not shuffle either side; plan had $shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // sorted buckets: the merge join needs no Sort either
      assert(!plan.linesIterator.exists(_.trim.startsWith("Sort ")),
        "sorted buckets should satisfy the merge join's ordering")
      // correctness: same rows as the unbucketed join
      assert(joined.count() == events.join(profiles, "user_id").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_events")
      spark.sql("DROP TABLE IF EXISTS bk_profiles")
    }
  }
}
