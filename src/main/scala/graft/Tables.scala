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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
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
