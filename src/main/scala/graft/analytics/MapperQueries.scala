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

  val defs: Seq[(String, QueryDef)] = Seq(
    "m7_js_mapper" -> QueryDef.of(m7Sql)(m7JsMapper)
  )
}
