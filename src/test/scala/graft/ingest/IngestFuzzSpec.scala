package graft.ingest

import graft.SparkSpec
import graft.core.SchemaRegistry

/** Fuzz gate for the ingest path: whatever bytes arrive on the wire —
  * truncated JSON, binary garbage, absurd nesting, huge numbers,
  * surrogate soup — the batch must fully materialize. Every line either
  * parses, is skipped (no collection), or dead-letters; NOTHING may
  * throw out of the executor task. */
class IngestFuzzSpec extends SparkSpec {

  private def fuzzLines(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    def junkValue(): String = rnd.nextInt(8) match {
      case 0 => "1e999999" // overflows double → Infinity
      case 1 => "-" + "9" * 40 // > Long range
      case 2 => "\"" + rnd.nextString(20).replace("\\", "").replace("\"", "") + "\""
      case 3 => "[" * 50 + "]" * 50 // deep but Jackson-legal nesting
      case 4 => "{\"a\":" + "{\"a\":" * 30 + "1" + "}" * 31
      case 5 => "null"
      case 6 => "\"" + "\\ud800" + "\"" // lone surrogate escape
      case _ => rnd.nextLong().toString
    }
    (0 until n).map { i =>
      rnd.nextInt(6) match {
        case 0 => // valid event with junk property values
          s"""{"collection": "c${i % 3}", "properties": {"p${i % 5}": ${junkValue()}}}"""
        case 1 => // truncated JSON
          s"""{"collection": "c1", "properties": {"x": 1""".take(10 + rnd.nextInt(30))
        case 2 => // binary-ish garbage
          new String(Array.fill(rnd.nextInt(40))((rnd.nextInt(255) + 1).toByte), "ISO-8859-1")
        case 3 => // wrong shapes
          Seq("[]", "17", "\"just a string\"", "{}",
            """{"properties": {"x": 1}}""",
            """{"collection": 42, "properties": {}}""")(rnd.nextInt(6))
        case 4 => // hostile field names
          s"""{"collection": "c1", "properties": {"${"q" * 300}": 1, "": 2, "união çã": 3}}"""
        case _ => // conflicting types across lines for the same field
          s"""{"collection": "c2", "properties": {"flip": ${
            if (rnd.nextBoolean()) "\"s\"" else "1.5"}}}"""
      }
    }
  }

  test("2000 hostile lines: ingest materializes, nothing escapes the task") {
    val registry = SchemaRegistry.inMemory()
    val lines = fuzzLines(seed = 42, n = 2000)
    val res = JsonIngest.ingest(spark, registry, "fuzz",
      spark.sparkContext.parallelize(lines, 8))
    // the assertion IS completing these actions without an exception
    val stored = res.byCollection.values.map(_.count()).sum
    val dead = res.deadLetter.count()
    assert(stored > 0, "some valid lines must survive")
    // registry stayed consistent: every stored collection has a schema
    res.byCollection.keys.foreach { c =>
      assert(registry.schema("fuzz", c).nonEmpty)
    }
    res.unpersist()
    assert(dead >= 0)
  }

  test("fuzzed pixel queries and batch envelopes never throw") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val q = new String(Array.fill(rnd.nextInt(60))((rnd.nextInt(94) + 32).toByte), "US-ASCII")
      BatchSources.pixelToEventJson(q) // Option, never an exception
    }
    (0 until 500).foreach { _ =>
      val body = new String(Array.fill(rnd.nextInt(120))((rnd.nextInt(94) + 32).toByte), "US-ASCII")
      try BatchSources.parseEnvelope(body)
      catch { case _: BatchSources.IngestRejected => () } // the ONLY allowed failure
    }
  }
}
