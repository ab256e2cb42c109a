package graft.store

import graft.core.SchemaRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar event store (S8's Spark restatement): append-only parquet
  * partitioned by `_month` derived from `_time` — the reference's
  * monthly range partitions (PostgresqlEventStore.java:149-158,
  * PostgresqlMetastore.java:310-311) become directory partitions, so
  * time-range queries prune at the source (dynamic partition pruning).
  * Partition creation is implicit in Spark — the retry dance the
  * reference does on constraint violations disappears.
  *
  * Source-only trigger fields (`_ip`, `_user_agent`, …) are dropped
  * before persist (P1, PostgresqlEventStore.java:362-373).
  *
  * Reads align files written under older schemas to the current
  * registry schema (missing columns null-filled — the unionByName
  * semantics of additive evolution).
  */
object EventStore {

  /** Magic source fields excluded from the persisted row (P1). */
  val sourceOnlyFields: Seq[String] = Seq("_ip", "_user_agent", "_referrer")

  private def tablePath(warehouse: String, project: String, collection: String) =
    s"$warehouse/$project/$collection"

  /** Append a typed batch; `_month` derived from `_time` when present. */
  def write(df: DataFrame, warehouse: String, project: String,
      collection: String): Unit = {
    val dropped = df.drop(sourceOnlyFields: _*)
    val withMonth =
      if (dropped.columns.contains("_time"))
        dropped.withColumn("_month", date_format(col("_time"), "yyyy-MM"))
      else dropped.withColumn("_month", lit("unknown"))
    withMonth.write.mode("append")
      .partitionBy("_month")
      .parquet(tablePath(warehouse, project, collection))
  }

  /** Read back aligned to the registry's current schema: files written
    * before an evolution lack the new columns; mergeSchema unions file
    * footers and the final select null-fills anything still missing
    * and fixes column order. */
  def read(spark: SparkSession, registry: SchemaRegistry, warehouse: String,
      project: String, collection: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(tablePath(warehouse, project, collection))
    registry.schema(project, collection) match {
      case None => df
      case Some(fields) =>
        val cols = fields.map { f =>
          if (df.columns.contains(f.name)) col(f.name).cast(f.tpe.spark).as(f.name)
          else lit(null).cast(f.tpe.spark).as(f.name)
        } :+ col("_month") // partition column rides along for pruning
        df.select(cols: _*)
    }
  }

  /** Dead-letter append (S14): `$invalid_schema` table per project. */
  def writeDeadLetter(dead: DataFrame, warehouse: String, project: String): Unit =
    dead.write.mode("append")
      .parquet(s"$warehouse/$project/invalid_schema")
}
