package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval-family contracts: BM25 ranking sanity (tf monotonicity on
  * the fixture corpus), fusion semantics (pool membership, rank
  * arithmetic), and the scale-shaped plans (filtered explode under the
  * shuffle; TakeOrderedAndProject serving, never a global sort). */
class RetrievalQueriesSpec extends SparkSpec {

  test("r1: top-k is ordered, bounded, and scores are positive") {
    val rows = RetrievalQueries.r1Bm25TopK(spark, sf()).collect()
    assert(rows.length == RetrievalQueries.TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "not score-descending")
    assert(scores.forall(_ > 0), "BM25+ idf floor keeps scores positive")
  }

  test("r1: a doc with more query-term occurrences outranks an otherwise-equal doc") {
    import spark.implicits._
    // two synthetic docs of equal length: one repeats a query term
    val docs = Seq(
      (1L, "spark spark spark filler filler filler"),
      (2L, "spark filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val scored = RetrievalQueries.bm25Scores(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L), "higher tf must score higher")
    assert(!scored.contains(3L), "no query term, no score row")
  }

  test("r2: rrf sums only the pools a doc appears in, ranks start at 1") {
    val rows = RetrievalQueries.r2RrfHybrid(spark, sf()).collect()
    assert(rows.length == RetrievalQueries.TopK)
    rows.foreach { r =>
      val (b, v, rrf) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      val expect =
        (if (b > 0) 1.0 / (RetrievalQueries.RrfK + b) else 0.0) +
          (if (v > 0) 1.0 / (RetrievalQueries.RrfK + v) else 0.0)
      assert(math.abs(rrf - expect) < 1e-12, s"rrf mismatch for $r")
      assert(b >= 0 && v >= 0 && (b > 0 || v > 0))
    }
  }

  test("bm25Scores matches a naive single-threaded reference on random corpora") {
    import spark.implicits._
    val k1 = RetrievalQueries.K1; val b = RetrievalQueries.B
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val terms = Seq("alpha", "delta", "theta")
    val rng = new scala.util.Random(1234)
    (1 to 3).foreach { trial =>
      val corpus = (1 to 30).map { id =>
        val len = 3 + rng.nextInt(12)
        (id.toLong, Vector.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }
      // naive reference: textbook BM25+ computed with plain Scala
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val nDocs = corpus.size
      val avgdl = toks.values.map(_.size).sum.toDouble / nDocs
      def idf(df: Int): Double =
        math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
      val df = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
      val expect = toks.flatMap { case (id, ts) =>
        val s = terms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0) 0.0
          else idf(df(t)) * (tf * (k1 + 1)) /
            (tf + k1 * (1 - b + b * ts.size / avgdl))
        }.sum
        if (terms.exists(ts.contains)) Some(id -> s) else None
      }
      val got = RetrievalQueries
        .bm25Scores(corpus.toDF("doc_id", "text"), terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet, s"trial $trial doc sets differ")
      // engine scores pass through the dsum decimal(38,6) accumulator
      // (the cross-engine parity mechanism), so each per-term addend is
      // quantized to 6 decimals — tolerance covers that, not float error
      got.foreach { case (id, s) =>
        assert(math.abs(s - expect(id)) < 1e-5,
          s"trial $trial doc $id: engine $s vs reference ${expect(id)}")
      }
    }
  }

  test("plans: r1 serves via TakeOrderedAndProject with the term filter under the aggregation") {
    val plan = RetrievalQueries.r1Bm25TopK(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global sort:\n$plan")
    // the term filter must sit scan-side (before the tf groupBy), so
    // only matched postings are shuffled
    val aggIdx = plan.indexOf("HashAggregate")
    val filtIdx = plan.lastIndexOf("Filter")
    assert(aggIdx >= 0 && filtIdx > aggIdx,
      "term filter must appear below the aggregation in the plan tree")
  }

  test("api.Retrieval: facade instantiations reproduce the registry shapes") {
    import graft.api.Retrieval
    val docs = graft.Tables(spark, sf(), "documents")
    // registry query == facade with the canned parameters, bitwise
    val reg = RetrievalQueries.r1Bm25TopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val api = Retrieval.bm25TopK(docs, RetrievalQueries.QueryTerms,
      RetrievalQueries.TopK)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(api == reg)
    // renamed columns standardize
    val renamed = docs.withColumnRenamed("doc_id", "id")
      .withColumnRenamed("text", "body")
    val api2 = Retrieval.bm25TopK(renamed, RetrievalQueries.QueryTerms,
      RetrievalQueries.TopK, idCol = "id", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(api2 == reg)
    // a different query ranks differently but stays bounded
    val other = Retrieval.bm25TopK(docs, Seq("customer", "window"), 5)
    assert(other.count() == 5)
    // evaluate == oracle-proven r4, including through renamed columns
    val regEval = RetrievalQueries.r4RetrievalMetrics(spark, sf())
      .collect()(0).toSeq
    assert(Retrieval.evaluate(docs).collect()(0).toSeq == regEval)
    assert(Retrieval.evaluate(renamed, idCol = "id", textCol = "body")
      .collect()(0).toSeq == regEval)
  }

  test("r3: phrase counting — overlaps, boundaries, and short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark hash join now spark hash join"), // two occurrences
      (2L, "spark hash but no third term here"),   // prefix only
      (3L, "a a spark hash join"),                 // at the end
      (4L, "spark hash"),                          // shorter than phrase
      (5L, "join hash spark")                      // right terms, wrong order
    ).toDF("doc_id", "text")
    val got = RetrievalQueries.r3From(docs, Seq("spark", "hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L), got.toString)
  }

  test("r3: native PhraseCount kernel == HOF executable spec on random corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d")
    val rng = new scala.util.Random(77)
    val corpus = (1 to 200).map { id =>
      val len = rng.nextInt(12) // includes docs SHORTER than the phrase
      (id.toLong, Vector.fill(len max 1)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "text")
    val phrase = Seq("a", "b", "a")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(RetrievalQueries.r3From(docs, phrase)) ==
      m(RetrievalQueries.r3HofFrom(docs, phrase)))
    // overlapping windows count individually: 'a b a b a' has 2 of 'a b a'
    val ov = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    assert(m(RetrievalQueries.r3From(ov, phrase)) == Map(1L -> 2L))
  }

  test("plans: r2 fuses two bounded pools (two TakeOrderedAndProjects feed the join)") {
    val plan = RetrievalQueries.r2RrfHybrid(spark, sf())
      .queryExecution.executedPlan.toString
    val takes = "TakeOrderedAndProject".r.findAllIn(plan).size
    assert(takes >= 2, s"expected both candidate pools bounded, plan:\n$plan")
  }

  test("r4: self-retrieval is perfect when every doc has a unique prefix") {
    import spark.implicits._
    // each doc's leading 5 tokens contain a token unique to it, and
    // shared filler pads the tail: the self-doc is the only one
    // matching its discriminative term, so BM25 must rank it first
    // for every query
    val docs = (1L to 30L).map { i =>
      (i, s"id$i a b c d " + "filler " * 5)
    }.toDF("doc_id", "text")
    val row = RetrievalQueries.r4From(docs).collect()(0)
    assert(row.getLong(0) === RetrievalQueries.EvalQueries)
    assert(row.getDouble(1) === 1.0, "mrr")
    assert(row.getDouble(2) === 1.0, "recall")
    assert(row.getDouble(3) === 1.0, "ndcg")
  }

  test("r4: a doc whose unique term is buried past rank 10 scores zero recall") {
    import spark.implicits._
    // every doc identical → the self-doc ties with 29 others and wins
    // only on the doc_id tiebreak when it has the smallest id in the
    // tie; ranks are deterministic, metrics bounded in (0, 1]
    val docs = (1L to 30L).map(i => (i, "x y z w v common tail")).toDF("doc_id", "text")
    val row = RetrievalQueries.r4From(docs).collect()(0)
    assert(row.getLong(0) === 20L)
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) < 1.0, "identical docs cannot all self-retrieve in top-10")
  }
}
