package graft

/** Every registered query runs at sf0.001 and yields a sane result —
  * the cheap local gate; value correctness is the driver's DuckDB
  * compare at sf0.01 (tools/oracle_check.py locally). */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.registry.foreach { case (name, qd) =>
    test(s"$name runs at sf0.001 inside whole-stage codegen") {
      val df = qd.build(spark, sf())
      // execute the query's OWN plan via toRdd: a .count() here would
      // column-prune the final projections away and never compile the
      // very expression chains the codegen check below exists to
      // exercise (Janino's 64 KB limit is a silent WARN + interpreted
      // fallback, invisible to correctness gates)
      var n = -1L
      val warns = capturingCodegenFallback {
        n = df.queryExecution.toRdd.count()
      }
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(!warns.exists(_.contains("Whole-stage codegen disabled")),
        s"$name dropped out of whole-stage codegen:\n${warns.mkString("\n")}")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no registered query emits a comparator-illegal column type") {
    // the driver's DuckDB comparator sorts result frames via pandas and
    // dies on array/map/struct cells (round-7 lost 4 rows to exactly
    // this: unhashable numpy.ndarray) — every registered row must emit
    // scalars only; array-returning builders stay programmatic API
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.registry.foreach { case (name, qd) =>
      qd.build(spark, sf()).schema.fields.foreach { f =>
        val bad = f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        }
        assert(!bad,
          s"$name column '${f.name}' is ${f.dataType.simpleString}: " +
            "complex-typed outputs crash the driver comparator — " +
            "encode as concat_ws/md5 scalar or per-component columns")
      }
    }
  }

  test("no registered query plans a CartesianProduct") {
    // the one join shape that cannot survive scale: a non-broadcast
    // cross product shuffles |left|×|right|. BroadcastNestedLoopJoin is
    // acceptable by construction (something proved small enough to
    // broadcast — the j2/bounds-frame pattern); CartesianProductExec
    // never is. A global sweep so no future operator reintroduces one.
    SparkEntry.registry.foreach { case (name, qd) =>
      val p = qd.build(spark, sf()).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — broadcast the small side " +
          s"or restructure the join:\n$p")
    }
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
