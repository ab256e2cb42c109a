package graft.analytics

import graft.SparkSpec

/** ds10 funnel semantics on a corpus where every stage bites:
  * sequential population filtering, stage composition = the registry
  * operators' own rules. */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  test("each stage filters the previous stage's survivors") {
    val good = (1 to 30).map(i => s"w$i").mkString("the ", " ", " a")
    val docs = Seq(
      // benchmark doc (excluded from the funnel, feeds decontam grams)
      (0L, "bench mark grams one two three four five", "en", "src0", 0L),
      // quality + unique + clean
      (1L, good, "en", "src1", 0L),
      // exact duplicate of doc 1 → dropped at the dedup stage
      (2L, good, "en", "src1", 0L),
      // too short → dropped at quality (and its duplicate-ness with
      // nothing must not resurrect it later)
      (3L, "tiny doc", "en", "src1", 0L),
      // quality but contains a benchmark 5-gram → dropped at decontam
      (4L, ("mark grams one two three" +: (1 to 25).map(i => s"x$i"))
        .mkString("the ", " ", " a"), "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TrainingSetQueries.ds10CurationFunnel _
    val tmp = graft.TempDirs.scratch("ds10")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = rows(spark, tmp.toString).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("1_ingested") === 4)  // docs 1-4 (src0 excluded)
    assert(out("2_quality") === 3)   // doc 3 fails the length rule
    assert(out("3_dedup") === 2)     // doc 2 loses to doc 1's min-id
    assert(out("4_decontam") === 1)  // doc 4 shares a benchmark gram
    // the one survivor lands in exactly one split
    val splits = out.keys.filter(_.startsWith("5_"))
    assert(splits.size === 1 && out(splits.head) === 1, out)
  }

  test("the funnel's quality stage count equals t_quality's keep count") {
    // the stage rule is shared CODE with t_quality (keepRule) — this
    // pins the composition end-to-end on the real corpus: stage-2 docs
    // == keep=true docs among the non-benchmark sources
    val dir = sf()
    val out = TrainingSetQueries.ds10CurationFunnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables(spark, dir, "documents")
    import org.apache.spark.sql.functions._
    val keeps = TextQueries.tQuality(spark, dir)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("source") =!= "src0" && col("keep"))
      .count()
    assert(out("2_quality") === keeps)
    // and the split stage re-derives ds7's assignment: clean docs'
    // split shares sum to the decontam stage
    val splitSum = out.keys.filter(_.startsWith("5_")).map(out).sum
    assert(splitSum === out("4_decontam"))
  }

  test("a duplicate whose canonical copy FAILED quality still survives dedup") {
    // the dedup stage operates on quality survivors: if the min-id
    // copy was dropped at quality, the surviving copy is canonical
    val short = "dup text here"
    val long = (1 to 30).map(i => s"w$i").mkString("the ", " ", " a")
    val docs = Seq(
      (1L, short, "en", "src1", 0L),           // fails quality
      (2L, long, "en", "src1", 0L),            // quality survivor
      (3L, long, "en", "src1", 0L))            // duplicate of 2 → dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.TempDirs.scratch("ds10b")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TrainingSetQueries.ds10CurationFunnel(spark, tmp.toString)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("2_quality") === 2)
    assert(out("3_dedup") === 1)
    assert(out("4_decontam") === 1)
  }
}
