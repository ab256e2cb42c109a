package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3): broadcast dimension joins (J1),
  * range joins (J2), point lookups (J3), event↔profile equi joins (J4),
  * as-of stitching (J5), semi/anti cohort joins (J6).
  *
  * Scale posture: dimension sides are explicitly `broadcast()` so the
  * fact scan never shuffles for them; the event↔profile join keys both
  * sides on the join column so Catalyst plans a shuffled hash / sort-merge
  * join that co-partitions by key — the 100 TB shape.
  */
object JoinQueries {

  /** J1: customers enriched through two broadcast dims (the GeoIP-lookup
    * join shape — reference MaxmindGeoIPEventMapper.java:166-222). */
  def j1DimJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(c("c_acctbal")).as("sum_acctbal"))
  }

  val j1Sql: String =
    s"""SELECT r_name, count(*) AS n_customers, ${sqlDsum("c_acctbal")} AS sum_acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name""".stripMargin

  /** J2: range join — quantity bucketed by a broadcast interval table
    * (the IP2Location BETWEEN-range lookup shape — reference
    * IP2LocationGeoIPEventMapper/IPReader). A broadcast nested-loop on a
    * 4-row dim is O(1) per probe; at scale one would sort ranges and
    * binary-search inside a UDF, but broadcast NLJ with a tiny dim is
    * already the right plan. */
  def j2RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranges = Seq(
      (0.0, 10.0, "small"), (10.0, 25.0, "medium"),
      (25.0, 40.0, "large"), (40.0, 60.0, "huge"))
      .toDF("lo", "hi", "bucket")
    Tables(spark, dir, "lineitem")
      .join(broadcast(ranges), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_items"), dsum($"l_extendedprice").as("sum_price"))
  }

  val j2Sql: String =
    s"""SELECT bucket, count(*) AS n_items, ${sqlDsum("l_extendedprice")} AS sum_price
       |FROM lineitem
       |JOIN (VALUES (0.0, 10.0, 'small'), (10.0, 25.0, 'medium'),
       |             (25.0, 40.0, 'large'), (40.0, 60.0, 'huge')) AS r(lo, hi, bucket)
       |  ON l_quantity >= lo AND l_quantity < hi
       |GROUP BY bucket""".stripMargin

  /** J3: point lookup (`select * from _users where id = ?` — reference
    * PostgresqlUserStorage.java:453-508). The predicate is pushed to the
    * parquet scan (PushedFilters), so only matching row groups are read. */
  def j3PointLookup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "customer").filter($"c_custkey" === 419L)
  }

  val j3Sql: String = "SELECT * FROM customer WHERE c_custkey = 419"

  /** J4: event↔profile equi join; `customer` plays `_users`, events key
    * into it by `user_id % |customer| + 1` (FIXTURES.md §B). The
    * |customer| scalar arrives via a broadcast single-row cross join so
    * the query stays scale-factor independent without a driver collect. */
  def j4EventProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables(spark, dir, "customer")
    val nCust = customer.agg(count(lit(1)).as("n_cust"))
    Tables(spark, dir, "events")
      .crossJoin(broadcast(nCust))
      .withColumn("c_key", ($"user_id" % $"n_cust") + 1)
      .join(customer, $"c_key" === customer("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        dsum($"value").as("sum_value"))
  }

  val j4Sql: String =
    s"""SELECT c_mktsegment, count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users, ${sqlDsum("value")} AS sum_value
       |FROM events
       |JOIN customer ON (user_id % (SELECT count(*) FROM customer)) + 1 = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

  /** J5: as-of join — for every purchase, the most recent prior click of
    * the same user (the anonymous-id merge shape, reference
    * PostgresqlUserService.java:18-36). Formulated as a single
    * partitioned window (no self-join): one shuffle on user_id, then a
    * running `last(click, ignoreNulls)` over the time-ordered stream —
    * this is the plan that survives 100 TB because state per user is one
    * row, not an O(n²) interval probe. */
  def j5AsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("prev_click_id",
        last(when($"event_type" === "click", $"event_id"), ignoreNulls = true).over(w))
      .withColumn("prev_click_ts",
        last(when($"event_type" === "click", $"ts"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("purchase_ts"),
        $"prev_click_id", $"prev_click_ts")
  }

  val j5Sql: String =
    """SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |  prev_click_id, prev_click_ts
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |) WHERE event_type = 'purchase'""".stripMargin

  private def eventProfileKeyed(spark: SparkSession, dir: String, types: Seq[String]): DataFrame = {
    import spark.implicits._
    val customer = Tables(spark, dir, "customer")
    val nCust = customer.agg(count(lit(1)).as("n_cust"))
    Tables(spark, dir, "events")
      .filter($"event_type".isin(types: _*))
      .crossJoin(broadcast(nCust))
      .select((($"user_id" % $"n_cust") + 1).as("c_key"))
  }

  /** J6 semi: profile rows whose user has ≥1 purchase (cohort membership,
    * reference UserPluginConfig.java:18-19). left_semi keeps the build
    * side dedup-free and streams the probe side. */
  def j6Semi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables(spark, dir, "customer")
    customer.join(eventProfileKeyed(spark, dir, Seq("purchase")),
        customer("c_custkey") === $"c_key", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val j6SemiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (
      |  SELECT 1 FROM events
      |  WHERE event_type = 'purchase'
      |    AND (user_id % (SELECT count(*) FROM customer)) + 1 = c_custkey)""".stripMargin

  /** J6 anti: profiles whose user never errored ("did X not Y"). */
  def j6Anti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables(spark, dir, "customer")
    customer.join(eventProfileKeyed(spark, dir, Seq("error")),
        customer("c_custkey") === $"c_key", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val j6AntiSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM events
      |  WHERE event_type = 'error'
      |    AND (user_id % (SELECT count(*) FROM customer)) + 1 = c_custkey)""".stripMargin

  /** J2b: the real IP2Location vendor-CSV path against the oracle —
    * [[graft.enrich.geo.Ip2LocationCsv]] parses a headerless
    * fully-quoted vendor file (built |nation|-bounded from the nation
    * table, a 25-row driver-side fixture write like s4's) and the
    * probe side joins by BETWEEN range. The DuckDB twin restates dim +
    * join from the nation parquet directly, so a parse or
    * column-mapping defect in the loader — quote handling, lo/hi
    * casts, or the reference's country-NAME-in-group-4 binding
    * (CSV.java:35-38): binding the 2-letter code instead would emit
    * `name.take(2)` and hash-mismatch — fails the row. Misses keep
    * NULL geo; the probe goes through [[graft.enrich.geo.Ip2LocationCsv
    * .rangeLookup]], which picks broadcast vs bin-sharded BY the dim's
    * measured plan size (r15): at this fixture scale — and at the
    * DB11-class 10M ranges, MEASURED 142.0 B/row ⇒ 1354 MB
    * (Ip2LocationDimSizeSpec) — it broadcasts; past the comfort line
    * it bin-shards instead of OOMing (Ip2LocationLookupSpec drives
    * both paths to identical rows). */
  def j2bIp2Location(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Tables(spark, dir, "nation")
      .select($"n_nationkey".cast("long"), $"n_name", $"n_regionkey".cast("long"))
      .collect()
    val f = graft.TempDirs.scratchFor("graft-j2b").resolve("ranges.csv")
    val lines = nations.map { r =>
      val k = r.getLong(0); val name = r.getString(1); val rk = r.getLong(2)
      s""""${k * 1000}","${k * 1000 + 999}","${name.take(2)}","$name","Region $rk","City $k","$k.5","-$k.25""""
    }
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dim = graft.enrich.geo.Ip2LocationCsv.rangeDim(spark, f.toString)
    val probes = Tables(spark, dir, "events")
      .select(pmod($"event_id", lit(26000L)).as("ipnum"))
    graft.enrich.geo.Ip2LocationCsv.rangeLookup(probes, $"ipnum", dim)
      .groupBy($"_country_code")
      .agg(count(lit(1)).as("n_probes"),
        countDistinct($"ipnum").as("n_ips"),
        min($"_city").as("first_city"))
  }

  val j2bSql: String =
    """WITH dim AS (
      |  SELECT CAST(n_nationkey AS BIGINT) * 1000 AS ip_lo,
      |         CAST(n_nationkey AS BIGINT) * 1000 + 999 AS ip_hi,
      |         n_name AS country,
      |         'City ' || CAST(CAST(n_nationkey AS BIGINT) AS VARCHAR) AS city
      |  FROM nation),
      |probes AS (SELECT event_id % 26000 AS ipnum FROM events)
      |SELECT d.country AS _country_code, count(*) AS n_probes,
      |  count(DISTINCT p.ipnum) AS n_ips, min(d.city) AS first_city
      |FROM probes p LEFT JOIN dim d ON p.ipnum BETWEEN d.ip_lo AND d.ip_hi
      |GROUP BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "j1_dim_join" -> QueryDef.of(j1Sql)(j1DimJoin),
    "j2_range_join" -> QueryDef.of(j2Sql)(j2RangeJoin),
    "j2b_ip2location_csv" -> QueryDef.of(j2bSql)(j2bIp2Location),
    "j3_point_lookup" -> QueryDef.of(j3Sql)(j3PointLookup),
    "j4_event_profile" -> QueryDef.of(j4Sql)(j4EventProfile),
    "j5_asof_join" -> QueryDef.of(j5Sql)(j5AsOf),
    "j6_semi_join" -> QueryDef.of(j6SemiSql)(j6Semi),
    "j6_anti_join" -> QueryDef.of(j6AntiSql)(j6Anti)
  )
}
