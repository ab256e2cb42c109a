package graft.ingest

import graft.core.{FieldType, Names, SchemaRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV batch source (S3) — header-driven column mapping against the
  * registry schema, mirroring CsvEventDeserializer.java:67-163:
  * header names are normalized, columns already registered are cast to
  * their registered type, new header columns are registered as STRING,
  * and the output column order follows the registry (column-index
  * remap). The scan itself is Spark's vectorized CSV reader, so
  * pushdown/pruning behave like any other source.
  */
object CsvIngest {

  def ingest(spark: SparkSession, registry: SchemaRegistry, project: String,
      collection: String, path: String): DataFrame = {
    val coll = Names.normalizeCollection(collection)
      .fold(e => throw new IllegalArgumentException(e), identity)
    val raw = spark.read.option("header", "true").csv(path)

    val headerFields = raw.columns.toSeq.map { c =>
      val norm = Names.normalizeField(c)
        .fold(e => throw new IllegalArgumentException(e), identity)
      // new header columns default STRING; _time is always TIMESTAMP
      val tpe = if (norm == "_time") FieldType.TIMESTAMP
        else registry.schema(project, coll)
          .flatMap(_.find(_.name == norm).map(_.tpe))
          .getOrElse(FieldType.STRING)
      (c, registry.Field(norm, tpe))
    }
    val (schema, _) = registry.getOrCreate(project, coll, headerFields.map(_._2))

    val renamed = headerFields.foldLeft(raw) { case (df, (orig, f)) =>
      df.withColumnRenamed(orig, f.name)
    }
    // registry column order, registered types, missing columns null
    val cols = schema.map { f =>
      if (renamed.columns.contains(f.name)) col(f.name).cast(f.tpe.spark).as(f.name)
      else lit(null).cast(f.tpe.spark).as(f.name)
    }
    renamed.select(cols: _*)
  }
}
