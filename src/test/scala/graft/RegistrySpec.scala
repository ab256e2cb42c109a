package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry discipline: every driver-visible query must be unique and
  * oracle-backed — a no-oracle entry is a permanently unverifiable row
  * in the correctness report. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across modules") {
    val names = SparkEntry.registry.map(_._1)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
  }

  test("every registered query has a DuckDB oracle twin") {
    val missing = SparkEntry.registry.collect {
      case (name, QueryDef(_, None)) => name
    }
    assert(missing.isEmpty, s"no oracle for: ${missing.mkString(", ")}")
    assert(SparkEntry.oracleSql.size == SparkEntry.registry.size)
  }

  test("oracle SQL is runnable text: non-empty, no stray semicolons") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      assert(!sql.trim.endsWith(";"), s"$name: trailing semicolon breaks the driver wrap")
    }
  }
}
