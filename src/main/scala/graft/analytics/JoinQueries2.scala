package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second wave of join/window coverage: the fact-fact shapes that
  * dominate at 100 TB (sort-merge co-partitioned joins), time-range
  * window frames, and the time-bounded funnel variant.
  */
object JoinQueries2 {

  /** J7 (TPC-H Q3 shape): customer ⋈ orders ⋈ lineitem revenue top-10.
    * orders⋈lineitem is the genuine fact-fact join — shuffle both sides
    * on orderkey (SMJ/shuffled-hash under AQE); customer is the
    * broadcast dim. Top-10 is TakeOrderedAndProject. */
  def j7FactJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables(spark, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = Tables(spark, dir, "orders")
      .filter($"o_orderdate" < lit("1995-03-15 00:00:00").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" > lit("1995-03-15 00:00:00").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(li("l_orderkey"), ord("o_orderdate"), ord("o_orderpriority"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val j7Sql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** W3b: time-range window frame — each event's trailing-1-hour
    * per-user activity (RANGE BETWEEN on epoch seconds). The range
    * frame is the shape rolling-window features use at scale; state per
    * partition is the frame, not the history. */
  def w3RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"epoch_s")
      .rangeBetween(-3600L, 0L)
    Tables(spark, dir, "events")
      .withColumn("epoch_s", expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("sum_last_hour",
        sum($"value".cast("decimal(38,9)")).over(w).cast("double"))
      .select($"user_id", $"event_id", $"epoch_s", $"n_last_hour", $"sum_last_hour")
  }

  val w3RangeSql: String =
    """SELECT user_id, event_id, epoch_s,
      |  count(*) OVER w AS n_last_hour,
      |  CAST(sum(CAST(value AS DECIMAL(38,9))) OVER w AS DOUBLE) AS sum_last_hour
      |FROM (
      |  SELECT user_id, event_id, value, epoch_us(ts) // 1000000 AS epoch_s
      |  FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin

  /** A6b: time-bounded funnel — view → click within 24h → purchase
    * within 24h of the click (the conversion-window contract of funnel
    * analytics; unbounded variant is a6_funnel). */
  def a6WindowedFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events").select($"user_id", $"event_type", $"ts")
    val day = expr("INTERVAL 24 HOURS")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val t2 = ev.filter($"event_type" === "click")
      .join(t1, "user_id").filter($"ts" > $"t1" && $"ts" <= $"t1" + day)
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val t3 = ev.filter($"event_type" === "purchase")
      .join(t2, "user_id").filter($"ts" > $"t2" && $"ts" <= $"t2" + day)
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    def step(df: DataFrame, n: Int) =
      df.agg(count(lit(1)).as("n_users")).select(lit(n).as("step"), $"n_users")
    step(t1, 1).union(step(t2, 2)).union(step(t3, 3))
  }

  val a6WindowedSql: String =
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN t1 ON e.user_id = t1.user_id
      |  WHERE event_type = 'click' AND ts > t1 AND ts <= t1 + INTERVAL 24 HOUR
      |  GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN t2 ON e.user_id = t2.user_id
      |  WHERE event_type = 'purchase' AND ts > t2 AND ts <= t2 + INTERVAL 24 HOUR
      |  GROUP BY e.user_id)
      |SELECT 1 AS step, count(*) AS n_users FROM t1
      |UNION ALL SELECT 2 AS step, count(*) AS n_users FROM t2
      |UNION ALL SELECT 3 AS step, count(*) AS n_users FROM t3""".stripMargin

  /** F13: map functions over the parsed property bag — from_json to a
    * typed map, filter entries, transform values (the reference's
    * per-entry cast semantics, JsonEventDeserializer.java:652-693). */
  def fMapOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .withColumn("m", from_json($"props", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
      .select(
        $"event_id",
        map_keys($"m").getItem(0).as("first_key"),
        $"m".getItem("k").cast("long").as("k_value"),
        size($"m").as("n_entries"))
  }

  val fMapOpsSql: String =
    """SELECT event_id,
      |  json_keys(props)[1] AS first_key,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
      |  len(json_keys(props)) AS n_entries
      |FROM events""".stripMargin

  /** Salt fan-out for [[j8SaltedJoin]]'s hot branch. */
  private val SaltBuckets = 8
  /** Probe-side rows-per-key at or above which a key counts as hot.
    * (8+ items/order is the top ~5% of this corpus; production surveys
    * set it from shuffle-partition size targets.) */
  private val HotKeyThreshold = 8

  /** J8: skew-treated fact-fact join, the full production pattern —
    * the treatment for hot join keys that broadcast can't fix (both
    * sides big) and AQE's in-partition splitting can't always reach:
    * 1. hot-key survey: one aggregate over the probe side's key,
    *    keeping keys with ≥ [[HotKeyThreshold]] rows (a tiny set —
    *    that is what makes them hot) broadcast everywhere;
    * 2. hot branch: probe rows get a deterministic salt from their OWN
    *    non-key attributes (never rand(): retries and speculative
    *    tasks must re-derive the same salt); build rows replicate once
    *    per bucket; the join keys on (key, salt), spreading each hot
    *    key over [[SaltBuckets]] partitions;
    * 3. cold branch: everything else joins plainly — no replication
    *    cost where there is no skew;
    * 4. union, then aggregate.
    * The oracle is the straight unsalted join — proving the whole
    * rewrite result-identical. */
  def j8SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")
    val hot = li.groupBy($"l_orderkey").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= HotKeyThreshold)
      .select($"l_orderkey".as("hk"))
    val liHot = li.join(broadcast(hot), li("l_orderkey") === hot("hk"), "leftsemi")
      .withColumn("salt",
        pmod(hash($"l_linenumber", $"l_partkey"), lit(SaltBuckets)))
    val liCold = li.join(broadcast(hot), li("l_orderkey") === hot("hk"), "leftanti")
    val ordHot = ord.join(broadcast(hot), ord("o_orderkey") === hot("hk"), "leftsemi")
      .withColumn("salt", explode(lit((0 until SaltBuckets).toArray)))
    val ordCold = ord.join(broadcast(hot), ord("o_orderkey") === hot("hk"), "leftanti")
    val hotJoin = liHot.join(ordHot,
        liHot("l_orderkey") === ordHot("o_orderkey") &&
          liHot("salt") === ordHot("salt"))
      .select(ordHot("o_orderpriority"), liHot("l_extendedprice"))
    val coldJoin = liCold.join(ordCold,
        liCold("l_orderkey") === ordCold("o_orderkey"))
      .select(ordCold("o_orderpriority"), liCold("l_extendedprice"))
    hotJoin.union(coldJoin)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsum($"l_extendedprice").as("sum_price"))
  }

  val j8Sql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  ${sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin

  /** F-ARRAYS: the array-function gallery over tokenized text — sort,
    * slice, membership, distinct, reverse — each with an exact DuckDB
    * list-function twin. Array results ride as joined strings so the
    * driver's row hash sees scalars. */
  def fArrays(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .select(
        $"doc_id",
        concat_ws(" ", array_sort(slice($"toks", 1, 5))).as("first5_sorted"),
        array_contains($"toks", "the").as("has_the"),
        size(array_distinct($"toks")).cast("long").as("n_distinct"),
        element_at(reverse($"toks"), 1).as("last_tok"))
  }

  val fArraysSql: String =
    """SELECT doc_id,
      |  array_to_string(list_sort(t[1:5]), ' ') AS first5_sorted,
      |  list_contains(t, 'the') AS has_the,
      |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
      |  t[len(t)] AS last_tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""".stripMargin

  /** J9: the BINNED interval join — point-in-interval matching where
    * BOTH sides are big, the case Spark has no native operator for (a
    * plain `BETWEEN` join plans as a nested loop: every point against
    * every interval). The rewrite: intervals explode to the hour bins
    * they cover, points carry their single bin, and the join is an
    * EQUI join on the bin followed by the exact BETWEEN residual. Each
    * (point, interval) pair meets in exactly ONE bin — the point's —
    * so no dedup pass is needed. Bin fan-out is bounded by interval
    * length / bin width; shuffle is hash-by-bin, which is also the
    * time-locality key, so both sides cluster naturally.
    *
    * The intervals here are activity BURSTS per event_type (sessions
    * over the whole stream: >1 h gaps split), and the points are
    * purchases — "how many purchases landed inside each burst of each
    * activity type", the ad-attribution / incident-window query shape.
    * Deterministic: island numbering keys on (ts, event_id). */
  /** The binned interval-join core: every (point, interval) pair where
    * `points(pointTsCol)` falls inside `[startCol, endCol]`, computed as
    * an equi join on the `binUnit` bin + the BETWEEN residual. Column
    * names must not collide between the two frames (the caller renames;
    * the facade enforces it). */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      pointTsCol: String, startCol: String, endCol: String,
      binUnit: String = "hour"): DataFrame = {
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names")
    val binned = intervals.withColumn("__ibin", explode(expr(
      s"sequence(date_trunc('$binUnit', $startCol), date_trunc('$binUnit', $endCol), INTERVAL 1 $binUnit)")))
    points.withColumn("__pbin", date_trunc(binUnit, col(pointTsCol)))
      .join(binned,
        col("__pbin") === col("__ibin") &&
          col(pointTsCol) >= col(startCol) && col(pointTsCol) <= col(endCol))
      .drop("__pbin", "__ibin")
  }

  def j9IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
    val wSeq = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
    val bursts = ev
      .withColumn("prev_ts", lag($"ts", 1).over(wSeq))
      .withColumn("brk",
        when($"prev_ts".isNull ||
          $"ts" > $"prev_ts" + expr("INTERVAL 1 HOUR"), 1L).otherwise(0L))
      .withColumn("burst_id", sum($"brk").over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"event_type", $"burst_id")
      .agg(min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        count(lit(1)).as("n_events"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"ts".as("p_ts"))
    val matched = pointInIntervalJoin(
        purchases, bursts, "p_ts", "start_ts", "end_ts")
      .groupBy($"event_type", $"burst_id")
      .agg(count(lit(1)).as("n_purchases"))
    bursts
      .join(matched, Seq("event_type", "burst_id"), "left")
      .select($"event_type", $"burst_id", $"start_ts", $"end_ts",
        $"n_events", coalesce($"n_purchases", lit(0L)).as("n_purchases"))
  }

  val j9Sql: String =
    """WITH seq AS (
      |  SELECT event_type, ts, event_id,
      |    lag(ts, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT event_type, ts, event_id,
      |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 1 HOUR
      |      THEN 1 ELSE 0 END AS brk
      |  FROM seq),
      |islands AS (
      |  SELECT event_type, ts,
      |    sum(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS burst_id
      |  FROM flagged),
      |bursts AS (
      |  SELECT event_type, CAST(burst_id AS BIGINT) AS burst_id,
      |    min(ts) AS start_ts, max(ts) AS end_ts, count(*) AS n_events
      |  FROM islands GROUP BY event_type, burst_id),
      |matched AS (
      |  SELECT b.event_type, b.burst_id, count(*) AS n_purchases
      |  FROM bursts b JOIN events p
      |    ON p.event_type = 'purchase' AND p.ts BETWEEN b.start_ts AND b.end_ts
      |  GROUP BY b.event_type, b.burst_id)
      |SELECT b.event_type, b.burst_id, b.start_ts, b.end_ts, b.n_events,
      |  CAST(coalesce(m.n_purchases, 0) AS BIGINT) AS n_purchases
      |FROM bursts b LEFT JOIN matched m
      |  ON b.event_type = m.event_type AND b.burst_id = m.burst_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "j7_fact_join" -> QueryDef.of(j7Sql)(j7FactJoin),
    "f_arrays" -> QueryDef.of(fArraysSql)(fArrays),
    "j8_salted_join" -> QueryDef.of(j8Sql)(j8SaltedJoin),
    "j9_interval_join" -> QueryDef.of(j9Sql)(j9IntervalJoin),
    "w3_range_frame" -> QueryDef.of(w3RangeSql)(w3RangeFrame),
    "a6_windowed_funnel" -> QueryDef.of(a6WindowedSql)(a6WindowedFunnel),
    "f_map_ops" -> QueryDef.of(fMapOpsSql)(fMapOps)
  )
}
