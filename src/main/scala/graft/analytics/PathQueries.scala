package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral path analytics on the event stream: where users go next,
  * which touchpoint gets credit for a conversion, and how an experiment
  * split performs — the reference's event-explorer / funnel family
  * extended to the path level (ref rakam/src/main/java/org/rakam/
  * analysis/EventExplorerHttpService.java drives the same grouped
  * event-sequence questions through its backend SQL).
  *
  * Scale posture (100 TB): every operator here is one shuffle on
  * user_id followed by per-user window work (events are naturally
  * user-partitionable), then a small aggregate. No self-joins: nexts
  * and prior touches come from lead/last-over-window within the one
  * partition pass.
  */
object PathQueries {

  /** Deterministic per-user event order: ts then event_id (unique). */
  private def userOrder = Seq(col("ts"), col("event_id"))

  // ---------------- A14: next-event transition matrix ----------------

  /** A14: Markov transition matrix over per-user event sequences —
    * count and probability of each (event_type → next event_type) step.
    * One window pass (lead) per user partition, then a grouped count;
    * p is a per-row integer division, deterministic on both engines. */
  /** The a14 core over any event frame in the standard shape
    * (user_id, ts, event_id, event_type). */
  def a14From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy(userOrder: _*)
    val steps = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
    val fromTotals = Window.partitionBy($"from_type")
    steps
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", $"n".cast("double") / sum($"n").over(fromTotals))
  }

  def a14EventPaths(spark: SparkSession, dir: String): DataFrame =
    a14From(Tables(spark, dir, "events"))

  val a14Sql: String =
    """WITH steps AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |counts AS (
      |  SELECT from_type, to_type, count(*) AS n FROM steps
      |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM counts""".stripMargin

  // ---------------- A15: last-touch attribution ----------------

  /** Attribution window: a conversion credits a touch at most this many
    * days before it. */
  private val AttrWindowDays = 7

  /** A15: last-touch conversion attribution — each purchase credits the
    * most recent preceding non-purchase event by the same user within
    * [[AttrWindowDays]] days (or "(none)"). The prior touch is carried
    * by `last(..., ignoreNulls)` over a frame ending one row before the
    * current — the as-of shape as a single window pass, no self-join —
    * and the credited value goes through the exact-decimal sum. */
  /** The a15 core over any event frame in the standard shape
    * (user_id, ts, event_id, event_type, value), parameterized by the
    * conversion event and the attribution window. */
  def a15From(events: DataFrame, conversionType: String = "purchase",
      windowDays: Int = AttrWindowDays): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy(userOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        last(when($"event_type" =!= conversionType,
          struct($"ts".as("t_ts"), $"event_type".as("t_type"))),
          ignoreNulls = true).over(w))
      .filter($"event_type" === conversionType)
      .withColumn("touch_type",
        when($"touch".isNotNull &&
          $"touch.t_ts" >= $"ts" - expr(s"INTERVAL $windowDays DAYS"),
          $"touch.t_type").otherwise(lit("(none)")))
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        dsum($"value").as("attributed_value"))
  }

  def a15Attribution(spark: SparkSession, dir: String): DataFrame =
    a15From(Tables(spark, dir, "events"))

  val a15Sql: String =
    s"""WITH touched AS (
       |  SELECT event_type, ts, value,
       |    last_value(CASE WHEN event_type <> 'purchase'
       |        THEN {'t_ts': ts, 't_type': event_type} END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
       |  FROM events),
       |conv AS (
       |  SELECT value,
       |    CASE WHEN touch IS NOT NULL
       |        AND touch['t_ts'] >= ts - INTERVAL $AttrWindowDays DAY
       |      THEN touch['t_type'] ELSE '(none)' END AS touch_type
       |  FROM touched WHERE event_type = 'purchase')
       |SELECT touch_type, count(*) AS n_conversions,
       |  ${sqlDsum("value")} AS attributed_value
       |FROM conv GROUP BY touch_type""".stripMargin

  // ---------------- A16: A/B experiment readout ----------------

  /** A16: experiment readout for a deterministic 50/50 user split
    * (variant = user-id hash parity — the same stable bucketing a real
    * assignment service persists): per-variant exposed users,
    * converters, conversion rate, revenue per user, and the two-
    * proportion z statistic of the rate difference. The z arithmetic is
    * fixed-order scalar double math — IEEE-identical across engines.
    *
    * One lineage, one `events` scan: the per-variant frame is 2 rows, so
    * the cross-variant na/ca/nb/cb are lifted by a whole-frame window
    * (single-partition over 2 rows — trivially cheap) instead of two
    * filtered re-aggregations of the same subplan. */
  def a16AbTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("converted"),
        sum(when($"event_type" === "purchase", $"value".cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
          .otherwise(lit(0).cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))).as("revenue"))
      .withColumn("variant",
        (DedupQueries.hash60($"user_id".cast("string")) % 2).cast("int"))
    val byVariant = perUser
      .groupBy($"variant")
      .agg(count(lit(1)).as("n_users"),
        sum($"converted").as("n_converters"),
        sum($"revenue").cast("double").as("revenue"))
      .withColumn("conv_rate", $"n_converters".cast("double") / $"n_users")
      .withColumn("revenue_per_user", $"revenue" / $"n_users")
    val wAll = Window.partitionBy()
    byVariant
      .withColumn("na", max(when($"variant" === 0, $"n_users")).over(wAll))
      .withColumn("ca", max(when($"variant" === 0, $"n_converters")).over(wAll))
      .withColumn("nb", max(when($"variant" === 1, $"n_users")).over(wAll))
      .withColumn("cb", max(when($"variant" === 1, $"n_converters")).over(wAll))
      .withColumn("pool", ($"ca" + $"cb").cast("double") / ($"na" + $"nb"))
      // z is undefined when the pooled rate is 0 or 1 (denominator √0) —
      // e.g. every exposed user converted — so guard to NULL, not a
      // divide-by-zero (ANSI mode throws; the oracle must agree).
      .withColumn("zden",
        sqrt($"pool" * (lit(1.0) - $"pool") *
          (lit(1.0) / $"na" + lit(1.0) / $"nb")))
      .withColumn("z",
        when($"zden" > 0,
          (($"ca".cast("double") / $"na") - ($"cb".cast("double") / $"nb")) /
            $"zden"))
      .select($"variant", $"n_users", $"n_converters", $"conv_rate",
        $"revenue", $"revenue_per_user", $"z")
  }

  val a16Sql: String =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
       |    sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(value AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS revenue,
       |    ${DedupQueries.sqlHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant
       |  FROM events GROUP BY user_id),
       |by_variant AS (
       |  SELECT CAST(variant AS INTEGER) AS variant,
       |    count(*) AS n_users,
       |    CAST(sum(converted) AS BIGINT) AS n_converters,
       |    CAST(sum(converted) AS DOUBLE) / count(*) AS conv_rate,
       |    CAST(sum(revenue) AS DOUBLE) AS revenue
       |  FROM per_user GROUP BY variant),
       |ab AS (
       |  SELECT
       |    (SELECT n_users FROM by_variant WHERE variant = 0) AS na,
       |    (SELECT n_converters FROM by_variant WHERE variant = 0) AS ca,
       |    (SELECT n_users FROM by_variant WHERE variant = 1) AS nb,
       |    (SELECT n_converters FROM by_variant WHERE variant = 1) AS cb),
       |zd AS (
       |  SELECT *, sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
       |      * (1.0 - (CAST(ca + cb AS DOUBLE) / (na + nb)))
       |      * (1.0 / na + 1.0 / nb)) AS zden
       |  FROM ab)
       |SELECT variant, n_users, n_converters, conv_rate, revenue,
       |  revenue / n_users AS revenue_per_user,
       |  CASE WHEN zden > 0 THEN
       |    ((CAST(ca AS DOUBLE) / na) - (CAST(cb AS DOUBLE) / nb)) / zden
       |  END AS z
       |FROM by_variant, zd""".stripMargin

  // ---------------- A3: ingest metrics ----------------

  /** A3: per-collection ingest metrics — the reference counts ingested
    * events per project as a first-class metric (SURVEY §2.4 A3); here
    * each collection reports volume, distinct users, payload bytes, and
    * its time span in one partial-agg'd pass. */
  def a3IngestMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type".as("collection"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum(length($"props").cast("long")).as("payload_bytes"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"))
  }

  val a3Sql: String =
    """SELECT event_type AS collection, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(len(props)) AS BIGINT) AS payload_bytes,
      |  min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY event_type""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "a14_event_paths" -> QueryDef.of(a14Sql)(a14EventPaths),
    "a15_attribution" -> QueryDef.of(a15Sql)(a15Attribution),
    "a16_ab_test" -> QueryDef.of(a16Sql)(a16AbTest),
    "a3_ingest_metrics" -> QueryDef.of(a3Sql)(a3IngestMetrics)
  )
}
