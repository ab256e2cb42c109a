package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators (SURVEY.md §2.2–§2.4, §2.6): segmentation
  * aggregations, dimension joins, windowed analytics. Each entry has a
  * DuckDB oracle twin; all doubles that pass through an aggregate use
  * the decimal-exact [[graft.analytics.dsum]] path for engine parity.
  */
object CoreQueries {

  /** Flagship (SURVEY §7.2 + TPC-H Q1 shape): pricing summary over
    * lineitem. Single shuffle on the two low-cardinality group keys;
    * partial aggregation happens map-side, so at 100 TB the shuffle
    * carries only (flag,status) × partial-buffer rows.
    */
  def q1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity")} AS sum_qty,
       |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${sqlDavg("l_quantity")} AS avg_qty,
       |  ${sqlDavg("l_extendedprice")} AS avg_price,
       |  ${sqlDavg("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q1_agg" -> QueryDef.of(q1Sql)(q1)
  )
}
