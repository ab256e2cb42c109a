package graft.ingest

import graft.SparkSpec
import graft.core.{FieldType, SchemaRegistry}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import java.nio.file.Files

/** S3 CSV header mapping and S4 Avro reader-schema resolution
  * (TestCSVParser + AvroEventDeserializer.java:26-45 shapes). */
class CsvAvroIngestSpec extends SparkSpec {

  test("CSV: header-driven mapping, registered types win, new cols STRING") {
    val r = SchemaRegistry.inMemory()
    r.getOrCreate("p", "sales", Seq(
      r.Field("_time", FieldType.TIMESTAMP),
      r.Field("price", FieldType.DOUBLE)))
    val dir = graft.TempDirs.scratch("graft-csv")
    Files.writeString(dir.resolve("batch.csv"),
      """_time,price,campaignName
        |2026-01-15 10:30:00,12.5,summer
        |2026-01-16 11:00:00,9.0,winter""".stripMargin)
    val df = CsvIngest.ingest(spark, r, "p", "Sales", dir.toString + "/batch.csv")
    // registry order: _time, price, then the new STRING column
    assert(df.columns.toSeq == Seq("_time", "price", "campaign_name"))
    assert(df.schema("price").dataType.typeName == "double")
    assert(df.schema("campaign_name").dataType.typeName == "string")
    val rows = df.orderBy("price").collect()
    assert(rows(0).getDouble(1) == 9.0 && rows(0).getString(2) == "winter")
    assert(r.schema("p", "sales").get.exists(f =>
      f.name == "campaign_name" && f.tpe == FieldType.STRING))
  }

  test("CSV: missing registered column reads null") {
    val r = SchemaRegistry.inMemory()
    r.getOrCreate("p", "c", Seq(
      r.Field("a", FieldType.STRING), r.Field("b", FieldType.LONG)))
    val dir = graft.TempDirs.scratch("graft-csv2")
    Files.writeString(dir.resolve("x.csv"), "a\nhello")
    val df = CsvIngest.ingest(spark, r, "p", "c", dir.toString + "/x.csv")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.collect().head.isNullAt(1))
  }

  test("Avro: old-writer file resolves against evolved reader schema") {
    val r = SchemaRegistry.inMemory()
    // writer schema: only (a). Write one record.
    val writerSchema = AvroIngest.avroSchema("c", Seq(
      "a" -> org.apache.spark.sql.types.StringType))
    val f = graft.TempDirs.scratch("graft-avro").resolve("old.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](writerSchema))
    w.create(writerSchema, f)
    val rec = new GenericData.Record(writerSchema)
    rec.put("a", "hello")
    w.append(rec); w.close()

    // registry evolved to (a, b LONG, ts TIMESTAMP)
    r.getOrCreate("p", "c", Seq(
      r.Field("a", FieldType.STRING),
      r.Field("b", FieldType.LONG),
      r.Field("ts", FieldType.TIMESTAMP)))
    val df = AvroIngest.ingest(spark, r, "p", "c", f.getAbsolutePath)
    val row = df.collect().head
    assert(row.getAs[String]("a") == "hello")
    assert(row.isNullAt(1) && row.isNullAt(2)) // missing fields null-filled
    assert(df.schema("ts").dataType.typeName == "timestamp")
  }

  test("Avro: date/timestamp/decimal value conversion") {
    val r = SchemaRegistry.inMemory()
    r.getOrCreate("p", "t", Seq(
      r.Field("d", FieldType.DATE),
      r.Field("ts", FieldType.TIMESTAMP)))
    val schema = AvroIngest.avroSchema("t", Seq(
      "d" -> org.apache.spark.sql.types.DateType,
      "ts" -> org.apache.spark.sql.types.TimestampType))
    val f = graft.TempDirs.scratch("graft-avro2").resolve("v.avro").toFile
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val rec = new GenericData.Record(schema)
    rec.put("d", 20_000)               // epoch days
    rec.put("ts", 1_700_000_000_000L)  // epoch millis
    w.append(rec); w.close()
    val row = AvroIngest.ingest(spark, r, "p", "t", f.getAbsolutePath).collect().head
    assert(row.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(20_000))
    assert(row.getAs[java.sql.Timestamp]("ts").getTime == 1_700_000_000_000L)
  }
}
