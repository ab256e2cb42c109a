package graft.store

import graft.ingest.AvroIngest
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Commit-log sink adapters (S9-S11). The reference ships three stream
  * stores; their *semantics* — what is serialized, how records are
  * keyed/salted, how bulk blobs and pointer records relate — are
  * engine-independent and implemented here. The transport formats
  * (kafka/kinesis connectors) plug into the same shaped DataFrames via
  * `df.write.format(...)` when their jars are present.
  */
object StreamSinks {

  /** S9 Kafka shape (KafkaEventStore.java:82-108): topic per
    * project_collection, magic source fields excluded from the payload,
    * value = JSON-serialized event. The result is exactly what
    * `.write.format("kafka")` consumes. */
  def kafkaShape(df: DataFrame, project: String, collection: String): DataFrame = {
    val payload = df.drop(EventStore.sourceOnlyFields: _*)
    payload.select(
      lit(s"${project}_$collection").as("topic"),
      (if (payload.columns.contains("_user")) col("_user").cast("string")
       else lit(null).cast("string")).as("key"),
      to_json(struct(payload.columns.map(col).toIndexedSeq: _*)).as("value"))
  }

  /** S10 Kinesis salting (AWSKinesisEventStore.java:148-160): partition
    * key = project|collection|salt. The reference uses rand(0,100000);
    * here the salt hashes the row (deterministic under replay) — the
    * load-spreading property is the same, retries don't double-write.
    * This is THE skew treatment for a hot collection: writes fan out
    * over `saltRange` shards regardless of key skew. */
  def saltedShards(df: DataFrame, project: String, collection: String,
      saltRange: Int): DataFrame =
    df.withColumn("_shard_key",
      concat_ws("|", lit(project), lit(collection),
        pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(saltRange))
          .cast("string")))

  /** S11 S3 Avro bulk (S3BulkEventStore.java:79-160): the batch becomes
    * one Avro container blob per partition, plus pointer records (the
    * manifest) naming each blob and its row count — the commit-log +
    * columnar-store pattern. Blobs are written executor-side (one per
    * partition, no driver collect); the returned manifest is the
    * pointer-record DataFrame the reference pushes to Kinesis. */
  def avroBulk(df: DataFrame, dir: String, project: String,
      collection: String): DataFrame = {
    val schema = df.schema
    val avroSchemaJson = AvroIngest.avroSchema(collection,
      schema.fields.map(f => f.name -> f.dataType).toSeq).toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = df.sparkSession
    val fieldTypes = schema.fields.map(_.dataType).toSeq
    val manifest = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val avroSchema = new org.apache.avro.Schema.Parser().parse(avroSchemaJson)
        val file = new java.io.File(dir, f"$project-$collection-part$pid%05d.avro")
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, file)
        var n = 0L
        it.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
            rec.put(name, toAvro(row.get(i), fieldTypes(i)))
          }
          w.append(rec)
          n += 1
        }
        w.close()
        Iterator(Row(project, collection, file.getAbsolutePath, n))
      }
    }
    spark.createDataFrame(manifest, StructType(Seq(
      StructField("project", StringType),
      StructField("collection", StringType),
      StructField("blob", StringType),
      StructField("n_events", LongType))))
  }

  /** Spark external value → Avro-writable value (inverse of
    * AvroIngest.convert). */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (t: java.sql.Timestamp, _) => t.getTime
    case (i: java.time.Instant, _) => i.toEpochMilli
    case (d: java.time.LocalDateTime, _) =>
      d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    case (d: java.math.BigDecimal, _) => d.doubleValue()
    case (s: scala.collection.Seq[_], ArrayType(e, _)) =>
      val l = new java.util.ArrayList[Any](s.size)
      s.foreach(x => l.add(toAvro(x, e)))
      l
    case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      val jm = new java.util.HashMap[String, Any]()
      m.foreach { case (k, vv) => jm.put(k.toString, toAvro(vv, vt)) }
      jm
    case (b: Array[Byte], _) => java.nio.ByteBuffer.wrap(b)
    case (other, _) => other
  }
}
