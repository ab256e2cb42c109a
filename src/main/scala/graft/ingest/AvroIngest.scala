package graft.ingest

import graft.core.SchemaRegistry
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DatumReader
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro batch source (S4) with reader-schema resolution — the
  * registry's current schema is the reader schema, so files written
  * under an older schema resolve on read: missing fields fill with
  * null, extra writer fields are dropped (the semantics of
  * AvroEventDeserializer.java:26-45).
  *
  * Files are distributed via `binaryFiles` and decoded per-partition
  * with Avro's own resolving decoder; one task per file container, which
  * is the right granularity for bulk-import blobs (the reference's S3
  * Avro micro-batches are single-digit-MB objects).
  */
object AvroIngest {

  def ingest(spark: SparkSession, registry: SchemaRegistry, project: String,
      collection: String, path: String): DataFrame = {
    val fields = registry.schema(project, collection)
      .getOrElse(throw new IllegalArgumentException(
        s"no registered schema for $project/$collection"))
    val readerSchema = avroSchema(collection, fields.map(f => f.name -> f.tpe.spark))
    val sparkSchema = StructType(fields.map(f =>
      StructField(f.name, f.tpe.spark, nullable = true)))
    val readerJson = readerSchema.toString

    val fieldTypes = fields.map(f => f.name -> f.tpe.spark)
    // Streaming decode: DataFileStream pulls blocks off the container's
    // InputStream as the iterator advances — no whole-file buffer, no
    // materialized row vector, so a multi-GB bulk blob decodes in
    // constant memory. The stream closes on task completion (the
    // iterator may not be fully consumed if downstream limits).
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val reader = new Schema.Parser().parse(readerJson)
      val datumReader: DatumReader[GenericRecord] =
        new GenericDatumReader[GenericRecord](null, reader)
      val in = pds.open()
      val fileReader = new org.apache.avro.file.DataFileStream[GenericRecord](in, datumReader)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try fileReader.close() finally in.close()
        })
      Iterator.continually(fileReader)
        .takeWhile(_.hasNext).map(_.next())
        .map(rec => Row.fromSeq(fieldTypes.map { case (n, dt) =>
          convert(rec.get(n), dt)
        }))
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Avro-decoded value → Spark external row value (epoch-days int →
    * Date, epoch-millis long → Timestamp, Utf8 → String, …). */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(l))
    case (d: java.lang.Double, dec: DecimalType) =>
      new java.math.BigDecimal(d.doubleValue()).setScale(dec.scale, java.math.RoundingMode.HALF_UP)
    case (u: org.apache.avro.util.Utf8, _) => u.toString
    case (l: java.util.List[_], ArrayType(e, _)) => l.asScala.toSeq.map(convert(_, e))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, vv) => k.toString -> convert(vv, vt) }.toMap
    case (b: java.nio.ByteBuffer, _) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (other, _) => other
  }

  /** Registry StructType → Avro schema: every field a UNION(NULL, T)
    * with null default (AvroUtil.java:90-96). */
  def avroSchema(name: String, fields: Seq[(String, DataType)]): Schema = {
    val fieldJson = fields.map { case (n, dt) =>
      s"""{"name": "$n", "type": ["null", ${avroType(dt)}], "default": null}"""
    }.mkString(", ")
    new Schema.Parser().parse(
      s"""{"type": "record", "name": "${name.replaceAll("[^A-Za-z0-9_]", "_")}",
         | "fields": [$fieldJson]}""".stripMargin)
  }

  private def avroType(dt: DataType): String = dt match {
    case StringType => "\"string\""
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case DoubleType => "\"double\""
    case _: DecimalType => "\"double\"" // reference carries DECIMAL as double (AvroUtil.java:208-210)
    case BooleanType => "\"boolean\""
    case DateType => "\"int\"" // epoch days (AvroUtil.java:213-216)
    case TimestampType | TimestampNTZType => "\"long\"" // epoch millis
    case BinaryType => "\"bytes\""
    case ArrayType(e, _) => s"""{"type": "array", "items": ["null", ${avroType(e)}]}"""
    case MapType(_, v, _) => s"""{"type": "map", "values": ["null", ${avroType(v)}]}"""
    case other => throw new IllegalArgumentException(s"unsupported $other")
  }
}
