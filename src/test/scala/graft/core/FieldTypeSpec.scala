package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FieldTypeSpec extends AnyFunSuite {

  test("30 field types, name round-trip") {
    assert(FieldType.all.size == 30)
    FieldType.all.foreach { t =>
      assert(FieldType.fromName(t.name) == t)
    }
  }

  test("spark round-trip (modulo TIME/INTEGER and DECIMAL precision)") {
    FieldType.all.foreach { t =>
      val back = FieldType.fromSpark(t.spark)
      t match {
        case FieldType.TIME => assert(back == FieldType.INTEGER)
        case FieldType.ARRAY(FieldType.TIME) => assert(back == FieldType.ARRAY(FieldType.INTEGER))
        case FieldType.MAP(FieldType.TIME) => assert(back == FieldType.MAP(FieldType.INTEGER))
        case _ => assert(back == t)
      }
    }
  }

  test("field name normalization: camelCase, quotes, diacritics") {
    assert(Names.normalizeField("campaignName") == Right("campaign_name"))
    assert(Names.normalizeField("\"quoted\"") == Right("quoted"))
    assert(Names.normalizeField("  spaced") == Right("spaced"))
    assert(Names.normalizeField("café") == Right("cafe"))
    assert(Names.normalizeField("ALLCAPS").isRight)
    assert(Names.normalizeField("日本語").isLeft)
    assert(Names.normalizeField("").isLeft)
    assert(Names.normalizeField("_time") == Right("_time"))
  }

  test("collection name: lowercased, capped at 100") {
    assert(Names.normalizeCollection("PageView") == Right("pageview"))
    assert(Names.normalizeCollection("x" * 101).isLeft)
    assert(Names.normalizeCollection(" ").isLeft)
  }

  test("pretty labels") {
    assert(Names.pretty("user_agent_family") == "User Agent Family")
  }

  test("normalization is idempotent (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(20) + 1).mkString +
        (if (rnd.nextBoolean()) "Xy" else "_z")
      Names.normalizeField(s).foreach { n =>
        assert(Names.normalizeField(n) == Right(n), s"input '$s' normalized '$n'")
      }
    }
  }
}
