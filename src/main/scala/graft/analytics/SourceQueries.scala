package graft.analytics

import graft.{QueryDef, Tables}
import graft.core.SchemaRegistry
import graft.ingest.BatchSources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion sources proven against the oracle end-to-end: the query
  * first *ingests* through the source under test (pixel param parsing,
  * remote-bulk CSV), then aggregates the ingested table; the DuckDB twin
  * aggregates the original parquet directly. A hash match proves the
  * source is value-preserving — parse, inference, typing and all. */
object SourceQueries {

  /** S5 pixel: every event re-encoded as a pixel GET query string
    * (`collection=…&prop.x=…`), parsed by the pixel source
    * (EventCollectionHttpService.java:278-348), inferred + typed by the
    * JSON pipeline, then aggregated. */
  def s5Pixel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val queries = Tables(spark, dir, "events")
      .select($"user_id", $"event_type",
        unix_millis($"ts".cast("timestamp")).as("ms"))
      .rdd.map { r =>
        s"collection=pixel_events&api.api_key=k1" +
          s"&prop._user=u${r.getLong(0)}&prop.etype=${r.getString(1)}" +
          s"&prop._time=${r.getLong(2)}"
      }
    val registry = SchemaRegistry.inMemory()
    val res = BatchSources.pixelIngest(spark, registry, "s5", queries)
    val df = res.byCollection("pixel_events")
      .groupBy($"etype")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"_user").as("n_users"),
        max(unix_millis($"_time")).as("last_time_ms"))
    df
  }

  // the pixel protocol carries _time at millisecond precision, so the
  // oracle compares at the same grain (epoch_ms floors, as does the
  // ingest-side unix_millis)
  val s5Sql: String =
    """SELECT event_type AS etype, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  max(epoch_ms(ts)) AS last_time_ms
      |FROM events GROUP BY event_type""".stripMargin

  /** S6 remote bulk: the nation table exported to CSV, fetched back
    * through the remote-bulk source by file:// URL
    * (EventCollectionHttpService.java:464-545 routes to the S3 CSV
    * reader), typed by the registry (new header columns STRING), then
    * aggregated with casts. */
  def s6RemoteBulk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-s6").toFile
    tmp.deleteOnExit()
    val csvDir = s"${tmp.getAbsolutePath}/nation"
    Tables(spark, dir, "nation")
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(csvDir)
    val part = new java.io.File(csvDir).listFiles()
      .find(_.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException("no csv part written"))
    val registry = SchemaRegistry.inMemory()
    val ingested = BatchSources.remoteBulk(spark, registry, "s6",
      BatchSources.BulkEventRemote("nation", Seq(part.toURI.toString),
        BatchSources.CopyType.CSV))
    ingested
      .select($"n_nationkey".cast("long").as("n_nationkey"),
        $"n_name", $"n_regionkey".cast("long").as("n_regionkey"))
      .groupBy($"n_regionkey")
      .agg(count(lit(1)).as("n_nations"), min($"n_name").as("first_nation"))
  }

  val s6Sql: String =
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |  count(*) AS n_nations, min(n_name) AS first_nation
      |FROM nation GROUP BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "s5_pixel" -> QueryDef.of(s5Sql)(s5Pixel),
    "s6_remote_bulk" -> QueryDef.of(s6Sql)(s6RemoteBulk)
  )
}
