package graft.store

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection

/** Pins SCALE.md's substring-index state-size claim with a measured
  * number (the rangeDim6 / UA-dictionary discipline): one state row
  * per distinct gram hash, four longs. The in-flight cost of the
  * probe's state join and the at-rest cost of a version are both
  * |distinct grams| × the B/row measured here, and |distinct grams| ≤
  * |tokens| — the state can never exceed the tokenization order of
  * the corpus itself, and dup-heavy corpora (the reason the index
  * exists) hold it well under. */
class SubstringStateSizeSpec extends SparkSpec {

  test("substring-index state rows measure 40 B unsafe (4-long layout) " +
    "and stay |distinct grams|-bounded") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val state = SubstringIndex.partial(docs)
    val schema = state.schema
    val (rows, bytes) = state.queryExecution.toRdd.mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      var n = 0L; var b = 0L
      it.foreach { r => n += 1; b += proj(r).getSizeInBytes.toLong }
      Iterator.single((n, b))
    }.collect().foldLeft((0L, 0L)) { case ((n1, b1), (n2, b2)) =>
      (n1 + n2, b1 + b2)
    }
    assert(rows > 10000L, s"fixture too small to trust: $rows state rows")
    val perRow = bytes.toDouble / rows
    info(f"substring state: $rows rows, $perRow%.1f B/row unsafe")
    // 8 B null bitset + 4 × 8 B fields; fail if a schema change
    // widens the row the 100 TB arithmetic in SCALE.md relies on
    assert(perRow <= 48.0, f"state row grew to $perRow%.1f B")
    // |distinct grams| ≤ |gram positions| ≤ |tokens|: the bound the
    // O(delta)-probe story rests on
    val positions = graft.analytics.DedupQueries
      .substringGrams(graft.analytics.DedupQueries.substringDocs(docs))
      .count()
    assert(rows <= positions,
      s"state rows $rows exceed gram positions $positions")
  }
}
