package graft.analytics

import graft.{QueryDef, Tables}
import graft.core.FieldType
import graft.enrich.js.JsCustomMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M7 proven against the oracle: events flow through a *JavaScript*
  * custom mapper (the sandboxed [[graft.enrich.js.JsEngine]], the
  * reference's CustomEventMapperHttpService contract), then a normal
  * aggregation; the DuckDB twin restates the script's arithmetic in
  * SQL. Exercises get/set/drop, number and string ops, and params —
  * through the real executor-side per-partition path. */
object MapperQueries {

  private val mapperJs =
    """function mapper(events, params, sourceIp, headers, sql, config) {
      |  var it = events.events();
      |  while (it.hasNext()) {
      |    var ev = it.next();
      |    if (ev.get('event_type') === params.dropType) { ev.drop(); continue; }
      |    ev.set('value_floor', Math.floor(ev.get('value')));
      |    ev.set('tag', ev.get('event_type').toUpperCase());
      |  }
      |}""".stripMargin

  def m7JsMapper(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .select($"event_id", $"event_type", $"value")
    val mapped = JsCustomMapper(
      name = "m7",
      collection = "events",
      produced = Seq("value_floor" -> FieldType.LONG, "tag" -> FieldType.STRING),
      params = Map("dropType" -> "error"),
      code = mapperJs)(ev)
    mapped.groupBy($"tag")
      .agg(count(lit(1)).as("n_events"),
        sum($"value_floor").as("sum_floor"))
  }

  val m7Sql: String =
    """SELECT upper(event_type) AS tag, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor
      |FROM events WHERE event_type <> 'error'
      |GROUP BY upper(event_type)""".stripMargin

  /** M4 + F16 against the oracle: every event gets a synthetic
    * X-Forwarded-For header (private hop first, then a deterministic
    * public IP — or a private one for every 5th user); the XFF mapper
    * extracts the first public IP, the geo mapper range-joins the full
    * Maxmind field set, and the counts per (country, timezone, isp,
    * connection_type) must match the oracle's closed-form derivation. */
  def m4Geoip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.enrich.{GeoIpMapper, MapperPipeline, XffIpMapper}
    val dim = Seq(
      (16777216L, 16777471L, "AU", "Australia/Sydney", "Telstra", "Cable/DSL"),
      (16777472L, 16777727L, "US", "America/New_York", "Comcast", "Corporate"),
      (16777728L, 16777983L, "DE", "Europe/Berlin", "DTAG", "Cellular"))
      .toDF("ip_lo", "ip_hi", "_country_code", "_timezone", "_isp", "_connection_type")
    val ev = Tables(spark, dir, "events")
      .withColumn("pub_ip",
        when($"user_id" % 5 === 0, lit("192.168.0.1"))
          .otherwise(concat(lit("1.0."), ($"user_id" % 4).cast("string"), lit(".7"))))
      .withColumn("_x_forwarded_for", concat(lit("10.0.0.1, "), $"pub_ip"))
      .select($"event_id", $"_x_forwarded_for")
    val enriched = MapperPipeline.run(ev, Seq(XffIpMapper, GeoIpMapper(dim)))
    enriched.groupBy($"_country_code", $"_timezone", $"_isp", $"_connection_type")
      .agg(count(lit(1)).as("n_events"))
  }

  val m4Sql: String =
    """SELECT
      |  CASE WHEN user_id % 5 = 0 THEN NULL
      |       WHEN user_id % 4 = 0 THEN 'AU' WHEN user_id % 4 = 1 THEN 'US'
      |       WHEN user_id % 4 = 2 THEN 'DE' ELSE NULL END AS _country_code,
      |  CASE WHEN user_id % 5 = 0 THEN NULL
      |       WHEN user_id % 4 = 0 THEN 'Australia/Sydney'
      |       WHEN user_id % 4 = 1 THEN 'America/New_York'
      |       WHEN user_id % 4 = 2 THEN 'Europe/Berlin' ELSE NULL END AS _timezone,
      |  CASE WHEN user_id % 5 = 0 THEN NULL
      |       WHEN user_id % 4 = 0 THEN 'Telstra' WHEN user_id % 4 = 1 THEN 'Comcast'
      |       WHEN user_id % 4 = 2 THEN 'DTAG' ELSE NULL END AS _isp,
      |  CASE WHEN user_id % 5 = 0 THEN NULL
      |       WHEN user_id % 4 = 0 THEN 'Cable/DSL' WHEN user_id % 4 = 1 THEN 'Corporate'
      |       WHEN user_id % 4 = 2 THEN 'Cellular' ELSE NULL END AS _connection_type,
      |  count(*) AS n_events
      |FROM events GROUP BY 1, 2, 3, 4""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "m7_js_mapper" -> QueryDef.of(m7Sql)(m7JsMapper),
    "m4_geoip" -> QueryDef.of(m4Sql)(m4Geoip)
  )
}
