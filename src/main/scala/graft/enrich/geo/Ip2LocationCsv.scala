package graft.enrich.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IP2Location CSV database → the broadcast range dim
  * [[graft.enrich.GeoIpMapper]] probes — the reference's second geo
  * vendor (mapper/rakam-mapper-geoip-ip2location/.../CSV.java:7-46,
  * IP2LocationGeoIPEventMapper.java:145-154). The file is headerless,
  * fully quoted, one range per line:
  *
  *   "ip_from","ip_to","country_code","country_name","region","city","lat","lon"
  *
  * Column mapping mirrors the reference verbatim: it binds its
  * `country` to capture group 4 — the long country NAME, not the
  * 2-letter code in group 3 — and stores it under `_country_code`
  * (CSV.java:35-38 → IP2LocationGeoIPEventMapper.java:149), so this
  * loader does exactly that rather than "fixing" the mapping and
  * silently diverging from what reference deployments store.
  *
  * The parse is Spark's CSV scan (quote handling native, predicate
  * pushdown like any source), NOT a driver loop — IP2Location's city
  * databases run ~10M ranges, which also broadcast comfortably:
  * the same ~200 B/row as [[MaxmindDb]]'s dim (RangeDimSizeSpec). */
object Ip2LocationCsv {

  def rangeDim(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("quote", "\"")
      .csv(path)
      .select(
        col("_c0").cast("long").as("ip_lo"),
        col("_c1").cast("long").as("ip_hi"),
        col("_c3").as("_country_code"),
        col("_c4").as("_region"),
        col("_c5").as("_city"),
        col("_c6").cast("double").as("_latitude"),
        col("_c7").cast("double").as("_longitude"))
      .filter(col("ip_lo").isNotNull && col("ip_hi").isNotNull)
}
