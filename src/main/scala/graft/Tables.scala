package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (see TESTDATA.md).
  *
  * Tables are driver-generated parquet under `/root/testdata/sf*`; the
  * `events` table plays the rakam event collection (reference:
  * rakam-spi/src/main/java/org/rakam/collection/Event.java), `customer`
  * plays the `_users` profile table. Reads go straight through
  * `spark.read.parquet` so Catalyst keeps predicate pushdown and column
  * pruning against the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft session needs. `nanosAsLong` lets the
    * parquet reader accept TIMESTAMP(NANOS) columns (events.ts) as raw
    * nanos, which [[apply]] then converts losslessly to microsecond
    * TIMESTAMP_NTZ — same floor-truncation DuckDB applies, so oracle
    * results agree. */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      // NANOS read as long: integer-div (not double-div — ns magnitudes
      // exceed 2^53) to micros, then to wall-clock NTZ in the UTC session.
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000"))
            .cast("timestamp_ntz"))
      case _ => df
    }
  }
}

/** One engine query: a DataFrame builder plus (optionally) the ANSI-SQL
  * twin executed by the DuckDB oracle over the same parquet tables. The
  * driver hash-compares both results with columns sorted by name, so
  * every computed column is aliased identically on both sides.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(sql: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(sql))
  def noOracle(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
