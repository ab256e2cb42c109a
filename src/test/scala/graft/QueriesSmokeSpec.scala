package graft

/** Every registered query runs at sf0.001 and yields a sane result —
  * the cheap local gate; value correctness is the driver's DuckDB
  * compare at sf0.01 (tools/oracle_check.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.registry.foreach { case (name, qd) =>
    test(s"$name runs at sf0.001") {
      val df = qd.build(spark, sf())
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle query has matching column names promised") {
    // column-name discipline: aliases must match the SQL twin; spot-check
    // that no query returns auto-generated names like sum(x) or count(1)
    SparkEntry.registry.foreach { case (name, qd) =>
      val cols = qd.build(spark, sf()).columns
      cols.foreach { c =>
        assert(!c.contains("("), s"$name has unaliased column '$c'")
      }
    }
  }
}
