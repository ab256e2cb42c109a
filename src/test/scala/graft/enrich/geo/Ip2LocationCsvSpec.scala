package graft.enrich.geo

import graft.SparkSpec
import graft.enrich.{GeoIpMapper, MapperPipeline}

/** The IP2Location CSV vendor path: quoted headerless rows → range dim
  * → the same broadcast probe as the MMDB dim. */
class Ip2LocationCsvSpec extends SparkSpec {

  test("CSV database loads and enriches through GeoIpMapper") {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("ip2loc")
    // 16777216 = 1.0.0.0, 16777471 = 1.0.0.255; 3405803776 = 203.0.113.0
    val rows = Seq(
      "\"16777216\",\"16777471\",\"AU\",\"Australia\",\"New South Wales\",\"Sydney\",\"-33.8688\",\"151.2093\"",
      "\"3405803776\",\"3405804031\",\"US\",\"United States\",\"California\",\"Los Angeles\",\"34.0522\",\"-118.2437\"")
    java.nio.file.Files.write(dir.resolve("db.csv"),
      rows.mkString("\n").getBytes("UTF-8"))
    val dim = Ip2LocationCsv.rangeDim(spark, dir.resolve("db.csv").toString)
    // the reference binds `country` to the long NAME (group 4) and
    // stores it under _country_code — mirrored, not fixed
    assert(dim.columns.toSeq == Seq("ip_lo", "ip_hi", "_country_code",
      "_region", "_city", "_latitude", "_longitude"))
    val events = Seq(
      (1L, "1.0.0.7"), (2L, "203.0.113.9"), (3L, "9.9.9.9"))
      .toDF("event_id", "_ip")
    val out = MapperPipeline.run(events, Seq(GeoIpMapper(dim)))
      .select($"event_id", $"_country_code", $"_city", $"_latitude")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), Option(r.get(3)))).toMap
    assert(out(1L) === (("Australia", "Sydney", Some(-33.8688))))
    assert(out(2L) === (("United States", "Los Angeles", Some(34.0522))))
    assert(out(3L) === ((null, null, None)))
  }
}
