package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Behavioral contracts of d15 (keep-first substring trim): the
  * transform keeps exactly one occurrence of a copied passage — the
  * lowest (doc_id, position) — and rewrites every other occurrence out
  * of the text, at any alignment, within or across documents; stock
  * phrases shorter than MinSpanTokens and mass-repeated boilerplate
  * above the occurrence cap are left alone.
  */
class SubstringTrimSpec extends SparkSpec {

  private def u(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => f"$prefix$i%04d")

  private def corpus(docs: Seq[(Long, Seq[String])]): String = {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-trim").toString
    docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def byDoc(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_toks"), r.getAs[Long]("kept_toks"),
          r.getAs[String]("text_deduped")))
    }.toMap

  test("d15 keeps the first occurrence of a cross-doc span intact and " +
    "trims exactly the copy, at a different alignment") {
    val span = u("shared", 30)
    val pre2 = u("c", 55)
    val post2 = u("d", 15)
    val dir = corpus(Seq(
      1L -> (u("a", 10) ++ span ++ u("b", 60)),
      2L -> (pre2 ++ span ++ post2)))
    val out = byDoc(DedupQueries.d15SubstringTrim(spark, dir))
    // doc 1 is the first occurrence: byte-identical pass-through
    assert(out(1L) == ((100L,
      100L, (u("a", 10) ++ span ++ u("b", 60)).mkString(" "))))
    // doc 2 loses exactly the 30 copied tokens
    assert(out(2L) == ((100L, 70L, (pre2 ++ post2).mkString(" "))))
  }

  test("d15 leaves a 12-token stock phrase and sub-gram docs untouched") {
    val phrase = u("phrase", 12)
    val d3 = u("e", 40) ++ phrase ++ u("f", 40)
    val d4 = u("g", 25) ++ phrase ++ u("h", 30)
    val d5 = u("i", 5)
    val dir = corpus(Seq(3L -> d3, 4L -> d4, 5L -> d5))
    val out = byDoc(DedupQueries.d15SubstringTrim(spark, dir))
    assert(out(3L) == ((92L, 92L, d3.mkString(" "))))
    assert(out(4L) == ((67L, 67L, d4.mkString(" "))))
    assert(out(5L) == ((5L, 5L, d5.mkString(" "))))
  }

  test("d15 on a three-way copy keeps one survivor (lowest doc_id)") {
    val span = u("triple", 25)
    val dir = corpus(Seq(
      11L -> (u("p", 20) ++ span),
      12L -> (span ++ u("q", 20)),
      13L -> (u("r", 10) ++ span ++ u("s", 10))))
    val out = byDoc(DedupQueries.d15SubstringTrim(spark, dir))
    assert(out(11L)._2 == 45L) // survivor intact
    assert(out(12L) == ((45L, 20L, u("q", 20).mkString(" "))))
    assert(out(13L) ==
      ((45L, 20L, (u("r", 10) ++ u("s", 10)).mkString(" "))))
  }

  test("d15 dedups within-document repetition, keeping the first copy") {
    val s = u("s", 25)
    val doc = u("x", 15) ++ s ++ u("y", 7) ++ s ++ u("z", 12)
    val dir = corpus(Seq(30L -> doc))
    val out = byDoc(DedupQueries.d15SubstringTrim(spark, dir))
    // second copy occupies 1-based positions 48..72: trimmed in full
    val expect = doc.zipWithIndex
      .collect { case (t, i) if i + 1 < 48 || i + 1 > 72 => t }
    assert(out(30L) == ((84L, 59L, expect.mkString(" "))))
  }

  test("d15 occurrence cap: boilerplate above the cap passes through, " +
    "the same block below the cap is trimmed to one copy") {
    import graft.Tables
    val block = u("boil", 22)
    val docs = (1L to 5L).map(id => id -> (u(s"f$id", 10) ++ block))
    val dir = corpus(docs)
    val frame = Tables(spark, dir, "documents")
    // every block gram occurs 5 times; cap 3 excludes them all
    val capped = byDoc(DedupQueries.d15From(frame, occCap = 3L))
    assert((1L to 5L).forall(id => capped(id)._2 == 32L))
    // the default cap admits them: docs 2..5 lose the block
    val trimmed = byDoc(DedupQueries.d15From(frame))
    assert(trimmed(1L)._2 == 32L)
    assert((2L to 5L).forall { id =>
      trimmed(id) == ((32L, 10L, u(s"f$id", 10).mkString(" ")))
    })
  }
}
