package graft.analytics

import graft.SparkSpec

/** mm5 semantics: the ≥2-distinct-shared-signature rule separates
  * re-encoded copies from videos sharing one stock frame (even a
  * REPEATED one), and the per-signature cap bounds degenerate
  * buckets. */
class FrameNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** Exactly 64 chars: eight 7-char tokens + separators + trailing
    * space, so fixture frames align 1:1 with mm5's 64-char slicer. */
  private def frame(tag: String) = {
    val f = (1 to 8).map(i => f"$tag$i%02dxxx").mkString(" ") + " "
    assert(f.length == 64, s"fixture frame must be 64 chars, was ${f.length}")
    f
  }

  private def run(rows: Seq[(Long, String)]) = {
    val docs = rows.map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = graft.TempDirs.scratch("mm5")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    MultimodalQueries.mm5FrameNearDup(spark, tmp.toString)
  }

  test("a full copy reports; one shared frame does not — even when repeated") {
    val a = frame("aa") + frame("bb") + frame("cc")
    val out = run(Seq(
      (1L, a),
      (2L, a), // copy → 3 shared signatures
      (3L, frame("aa") + frame("dd") + frame("ee")), // shares ONLY aa
      // repeats the aa frame twice: the join yields TWO frame pairs
      // against doc 1's single aa, but only ONE distinct signature —
      // must NOT report
      (4L, frame("aa") + frame("aa") + frame("ff"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    assert(out === Seq((1L, 2L, 3L)), out)
  }

  test("the per-signature cap actually bounds a >cap bucket") {
    // 100 docs all carrying the SAME two frames: both signature
    // buckets hold 100 entries, the cap keeps the first 64 (by
    // doc_id, frame_no), and only pairs inside the capped set share
    // ≥2 signatures → exactly C(64,2) pairs, not C(100,2)
    val text = frame("gg") + frame("hh")
    val out = run((1L to 100L).map(i => (i, text)))
    assert(out.count() === 64L * 63 / 2, "cap did not bound the bucket")
  }
}
