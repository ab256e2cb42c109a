package graft.ingest

import graft.SparkSpec
import graft.core.{FieldType, SchemaRegistry}

/** Mirrors the reference parser suite's shapes
  * (rakam/src/test/java/TestEventJsonParser.java:75-444): inference,
  * coercion, promotion, dead-letter routing, schema evolution. */
class JsonIngestSpec extends SparkSpec {

  private def ingest(lines: String*)(implicit r: SchemaRegistry) =
    JsonIngest.ingest(spark, r, "demo", spark.sparkContext.parallelize(lines, 2))

  test("simple event: types inferred per §1.2 rules") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    val res = ingest(
      """{"collection": "PageView", "properties": {
        |"campaign": "summer", "price": 12.5, "clicks": 3,
        |"signup_date": "2026-01-10", "at": "2026-01-15 10:30:00.000",
        |"is_new": true, "tags": ["a", "b"], "attrs": {"k1": "v1"}}}""".stripMargin.replace("\n", " "))
    val schema = r.schema("demo", "pageview").get.map(f => f.name -> f.tpe).toMap
    assert(schema("campaign") == FieldType.STRING)
    assert(schema("price") == FieldType.DOUBLE)
    assert(schema("clicks") == FieldType.DOUBLE) // all JSON numbers → DOUBLE
    assert(schema("signup_date") == FieldType.DATE)
    assert(schema("at") == FieldType.TIMESTAMP)
    assert(schema("is_new") == FieldType.BOOLEAN)
    assert(schema("tags") == FieldType.ARRAY(FieldType.STRING))
    assert(schema("attrs") == FieldType.MAP(FieldType.STRING))
    val row = res.byCollection("pageview").collect().head
    assert(row.getAs[String]("campaign") == "summer")
    assert(row.getAs[scala.collection.Seq[String]]("tags") == Seq("a", "b"))
    assert(res.deadLetter.count() == 0)
  }

  test("empty array/object creates no field (F14)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"xs": [], "m": {}, "ok": 1}}""")
    assert(r.schema("demo", "c").get.map(_.name) == Seq("ok"))
  }

  test("scalar sent to array field promotes to singleton (F12)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"xs": ["a"]}}""")
    val res = ingest("""{"collection": "c", "properties": {"xs": "solo"}}""")
    val values = res.byCollection("c").collect()
      .map(_.getAs[scala.collection.Seq[String]]("xs")).filter(_ != null)
    assert(values.map(_.toSeq).contains(Seq("solo")))
  }

  test("stringified array parses into typed array (F11)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"xs": [1.5]}}""")
    val res = ingest("""{"collection": "c", "properties": {"xs": "[2.5, 3.5]"}}""")
    val values = res.byCollection("c").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("xs")).filter(_ != null)
    assert(values.map(_.toSeq).contains(Seq(2.5, 3.5)))
  }

  test("object sent to scalar field dead-letters, row survives (S14)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"x": "str", "y": 1}}""")
    val res = ingest("""{"collection": "c", "properties": {"x": {"nested": 1}, "y": 2}}""")
    // nested object to STRING coerces to JSON text per F10 — use numeric target
    val res2 = ingest("""{"collection": "c", "properties": {"y": {"bad": true}}}""")
    val dead = res2.deadLetter.collect()
    assert(dead.exists(d => d.getAs[String]("property") == "y"))
    assert(res.deadLetter.count() == 0) // object→STRING is legal JSON-encode
  }

  test("numeric string coerces, junk string dead-letters (F9)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"n": 1.0}}""")
    val ok = ingest("""{"collection": "c", "properties": {"n": "42"}}""")
    assert(ok.byCollection("c").collect().map(_.getAs[Any]("n")).contains(42.0))
    val bad = ingest("""{"collection": "c", "properties": {"n": "abc"}}""")
    assert(bad.deadLetter.count() == 1)
  }

  test("boolean strings coerce (530-543)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"b": true}}""")
    val res = ingest("""{"collection": "c", "properties": {"b": "false"}}""")
    assert(res.byCollection("c").collect().map(_.getAs[Any]("b")).contains(false))
  }

  test("schema evolution: second batch adds field, old rows read null") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"a": "x"}}""")
    val res = ingest("""{"collection": "c", "properties": {"a": "y", "referrer": "g"}}""")
    assert(r.schema("demo", "c").get.map(_.name) == Seq("a", "referrer"))
    assert(res.byCollection("c").columns.toSeq == Seq("a", "referrer"))
  }

  test("camelCase and diacritic field names normalize (F1)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "c", "properties": {"campaignName": 1, "café": "x"}}""")
    assert(r.schema("demo", "c").get.map(_.name).toSet == Set("campaign_name", "cafe"))
  }

  test("_user type unified by set-once USER_TYPE") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest("""{"collection": "a", "properties": {"_user": 42}}""")
    assert(r.config("demo", "USER_TYPE").contains("LONG"))
    val res = ingest("""{"collection": "b", "properties": {"_user": "77"}}""")
    val t = r.schema("demo", "b").get.find(_.name == "_user").get.tpe
    assert(t == FieldType.LONG)
    assert(res.byCollection("b").collect().head.getAs[Long]("_user") == 77L)
  }

  test("USER_TYPE tiebreak: two collections disagreeing in one first " +
      "batch resolve by lexicographic (collection, type)") {
    // r16 verdict #4: the winner used to be Map-iteration-order luck.
    // Collections "a" (STRING _user) and "b" (LONG _user) in ONE first
    // batch: the smallest (collection, type) pair is ("a", "STRING"),
    // so USER_TYPE pins STRING — deterministically, every run.
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    ingest(
      """{"collection": "b", "properties": {"_user": 42}}""",
      """{"collection": "a", "properties": {"_user": "alice"}}""")
    assert(r.config("demo", "USER_TYPE").contains("STRING"))
    val ta = r.schema("demo", "a").get.find(_.name == "_user").get.tpe
    val tb = r.schema("demo", "b").get.find(_.name == "_user").get.tpe
    assert(ta == FieldType.STRING && tb == FieldType.STRING)
  }

  test("string values truncate to 100 chars (F2)") {
    implicit val r: SchemaRegistry = SchemaRegistry.inMemory()
    val long = "x" * 150
    val res = ingest(s"""{"collection": "c", "properties": {"s": "$long"}}""")
    assert(res.byCollection("c").collect().head.getAs[String]("s").length == 100)
  }
}
