package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Behavioral contracts of the substring-level dedup pair:
  * d11 (sliding-gram duplicated spans) finds a shared span at ANY
  * alignment and ignores short phrase collisions; d12 (content-defined
  * chunking) re-synchronizes after an insertion that de-aligns every
  * fixed chunk boundary. */
class DupSpanSpec extends SparkSpec {

  /** Unique, non-colliding tokens: uNNN for doc-private filler. */
  private def u(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => f"$prefix$i%04d")

  private def corpus(docs: Seq[(Long, Seq[String])]): String = {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-docs").toString
    docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def byDoc(df: DataFrame): Map[Long, (Long, Long, Double)] =
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac")))
    }.toMap

  test("d11 finds a 30-token shared span at different offsets, " +
    "ignores a 12-token phrase, and keeps short docs at zero") {
    val span = u("shared", 30)
    val phrase = u("phrase", 12)
    val dir = corpus(Seq(
      // span at offset 10 in doc 1, offset 55 in doc 2 — no alignment
      1L -> (u("a", 10) ++ span ++ u("b", 60)),
      2L -> (u("c", 55) ++ span ++ u("d", 15)),
      // only the short phrase is shared with doc 4 — under MinSpanTokens
      3L -> (u("e", 40) ++ phrase ++ u("f", 40)),
      4L -> (u("g", 25) ++ phrase ++ u("h", 30)),
      // shorter than the gram width entirely
      5L -> u("i", 5)))
    val out = byDoc(DedupQueries.d11DupSpans(spark, dir))
    assert(out(1L) == ((100L, 30L, 0.30)))
    assert(out(2L) == ((100L, 30L, 0.30)))
    assert(out(3L)._2 == 0L && out(4L)._2 == 0L)
    assert(out(5L) == ((5L, 0L, 0.0)))
  }

  test("d11 counts overlapping spans' tokens once (interval merge)") {
    // doc 6 repeats a 40-token block twice back to back; doc 7 carries
    // one copy — doc 7's two overlapping gram runs must merge
    val block = u("blk", 40)
    val dir = corpus(Seq(
      6L -> (block ++ block ++ u("x", 20)),
      7L -> (u("y", 30) ++ block ++ u("z", 30))))
    val out = byDoc(DedupQueries.d11DupSpans(spark, dir))
    // doc 7: exactly the 40 block tokens, counted once
    assert(out(7L)._2 == 40L)
    // doc 6: the doubled block is one continuous 80-token dup region
    assert(out(6L)._2 == 80L)
  }

  test("d13 strips cross-doc boilerplate but keeps unique text and " +
    "within-doc repetition") {
    val boiler = u("bp", 60)
    val mineA = u("ua", 40)
    val mineB = u("ub", 40)
    // doc 21 repeats its own 40 tokens — within-doc, must survive
    val dir = corpus(Seq(
      20L -> (mineA ++ boiler),
      21L -> (boiler ++ mineB ++ mineB)))
    val out = DedupQueries.d13From(graft.Tables(spark, dir, "documents"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_tokens"), r.getAs[String]("kept_text")))).toMap
    // every unique token survives; no boilerplate token does — modulo
    // the chunk straddling the boundary (CDC cuts are content-local,
    // so at most one chunk spans the seam on each side)
    val (keptA, textA) = out(20L)
    val (keptB, textB) = out(21L)
    val bpSet = boiler.toSet
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    assert(toks(textA).count(bpSet) <= CdcSeamAllowance)
    assert(toks(textB).count(bpSet) <= CdcSeamAllowance)
    assert(mineA.forall(toks(textA).contains) ||
      mineA.drop(CdcSeamAllowance).forall(toks(textA).contains))
    // within-doc repeat survives in full
    assert(toks(textB).count(_.startsWith("ub")) == 80 -
      toks(textB).count(_.startsWith("__never")) &&
      toks(textB).count(_.startsWith("ub")) >= 80 - CdcSeamAllowance)
    assert(keptA < 100 && keptB < 140) // boilerplate really was removed
  }

  /** Tokens a seam-straddling chunk may carry across a block boundary:
    * bounded by the expected chunk length, generously. */
  private val CdcSeamAllowance = 24

  test("d12 CDC chunking re-synchronizes after an insertion that " +
    "de-aligns every fixed chunk") {
    val base = u("t", 200)
    val edited = base.take(3) ++ Seq("INSERTED") ++ base.drop(3)
    val dir = corpus(Seq(10L -> base, 11L -> edited))
    val out = DedupQueries.d12CdcChunks(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Double]("dup_frac")))).toMap
    // CDC boundaries depend on local content only, so everything past
    // the edit deduplicates; both docs are mostly duplicated text
    assert(out(10L)._2 > 0.8, s"base dup_frac ${out(10L)._2}")
    assert(out(11L)._2 > 0.8, s"edited dup_frac ${out(11L)._2}")

    // the fixed-width strawman on the same pair: chunks at 20-token
    // boundaries share nothing after the insertion point
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fixed = graft.Tables(spark, dir, "documents")
      .select($"doc_id", posexplode(expr(
        "transform(sequence(1, int(ceil(size(split(text, ' ')) / 20.0))), " +
          "k -> concat_ws(' ', slice(split(text, ' '), (k - 1) * 20 + 1, 20)))")))
      .groupBy($"col").agg(countDistinct($"doc_id").as("n_docs"))
      .filter($"n_docs" > 1).count()
    // only the chunk BEFORE the insertion can match — nothing re-syncs
    assert(fixed <= 1L, s"fixed chunking unexpectedly matched $fixed chunks")
  }
}
