package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the document corpus: BM25 ranking, a
  * vector-space (tf-idf cosine) second scorer, and reciprocal-rank
  * fusion of the two candidate pools — the keyword side of the
  * retrieval stack that [[SimilarityQueries]] covers on the embedding
  * side. A training-data pipeline runs exactly this shape for targeted
  * corpus probes ("find the documents about X"), contamination triage
  * (rank the corpus against a benchmark query before the expensive
  * n-gram pass), and hybrid dedup candidate generation.
  *
  * The reference has no text-retrieval operator (its search surface is
  * the event-explorer attribute filter,
  * ref rakam/src/main/java/org/rakam/analysis/EventExplorerHttpService.java:117-210);
  * this family is part of the LLM-pipeline surface the engine adds.
  *
  * Engine parity: every per-(doc, term) score is scalar IEEE-754
  * arithmetic with the association order spelled identically in the
  * SQL twin, and every sum across terms funnels through the exact
  * decimal accumulator ([[dsum]]), so ranking keys are bit-identical
  * across engines; all orderings carry a doc_id tiebreak.
  *
  * Scale posture (100 TB): no all-pairs anywhere. The BM25 pass
  * filters the exploded token stream to the query's terms BEFORE any
  * shuffle, so the grouped state is O(postings of the query terms),
  * not O(corpus tokens); document length is computed scan-side
  * (`size(split(...))` — no join back); corpus stats ride a 1-row
  * broadcast. Fusion joins two TakeOrderedAndProject candidate pools
  * ([[PoolSize]] rows each) — the standard fuse-candidate-lists form —
  * never full rankings. The pre-built serving path for repeated
  * queries is [[graft.store.InvertedIndex]], which persists the
  * (term, doc) postings this query derives on the fly and prunes its
  * scan to the probed terms' hash shards.
  */
object RetrievalQueries {

  /** BM25 constants (Robertson–Spärck Jones defaults). Exact decimal
    * literals, so both engines parse the identical double. */
  val K1 = 1.2
  val B = 0.75

  /** The canned probe query for the oracle gallery. */
  val QueryTerms: Seq[String] = Seq("spark", "hash", "join", "stream")

  /** Candidate pool per scorer fed into the fusion stage. */
  val PoolSize = 100

  /** Fused results served. */
  val TopK = 10

  /** RRF dampening constant (Cormack et al. 2009's k=60). */
  val RrfK = 60

  private def qlist: String = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** Per-doc token stream restricted to the query terms, carrying the
    * scan-side doc length: (doc_id, dl, tok). Two-stage scan-side
    * pruning, both UNDER the shuffle: an `arrays_overlap` row filter
    * drops documents containing NO query term before anything explodes
    * (on a real corpus most documents match nothing — the explode
    * multiplies only the matching minority), then the per-token filter
    * keeps just the matched postings. Tokenization happens once
    * (projected), not once per stage. */
  private def matchedToks(docs: DataFrame, terms: Seq[String]): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(arrays_overlap($"toks",
        array(terms.map(lit): _*)))
      .select($"doc_id", size($"toks").cast("long").as("dl"),
        explode($"toks").as("tok"))
      .filter($"tok".isin(terms: _*))
  }

  /** 1-row corpus stats (n_docs, avgdl) — broadcasts. */
  private def corpusStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(size(split($"text", " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum($"dl").cast("double") / count(lit(1))).as("avgdl"))
  }

  /** BM25 idf: ln((n_docs − df + 0.5) / (df + 0.5) + 1) — the
    * +1 ("BM25+" floor) keeps the weight positive even for terms in
    * more than half the corpus, which this tiny-vocab synthetic corpus
    * hits for every term. */
  private def idfCol(nDocs: Column, df: Column): Column =
    log((nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5)) + lit(1.0))

  private def sqlIdf(nDocs: String, df: String): String =
    s"ln((CAST($nDocs AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) / " +
      s"(CAST($df AS DOUBLE) + 0.5) + 1.0)"

  /** The per-(doc, term) BM25 contribution. Association order is the
    * SQL twin's, verbatim. */
  private def bm25Term(idf: Column, tf: Column, dl: Column,
      avgdl: Column): Column =
    idf * (tf.cast("double") * lit(K1 + 1)) /
      (tf.cast("double") +
        lit(K1) * (lit(1 - B) + lit(B) * dl.cast("double") / avgdl))

  private def sqlBm25Term(idf: String, tf: String, dl: String,
      avgdl: String): String =
    s"$idf * (CAST($tf AS DOUBLE) * ${K1 + 1}) / (CAST($tf AS DOUBLE) + " +
      s"$K1 * (${1 - B} + $B * CAST($dl AS DOUBLE) / $avgdl))"

  /** Score a matched-postings frame `(doc_id, dl, tok, tf)` against a
    * 1-row stats frame `(n_docs, avgdl)` — the ONE BM25 scoring
    * implementation, shared by the on-the-fly query below and the
    * persisted serving path ([[graft.store.InvertedIndex.probe]]), so
    * index-served scores are bit-identical to the batch scan's by
    * construction. df is derived from the already-matched postings
    * (one grouped count, ≤ |query terms| rows after partial agg),
    * never from a corpus-wide vocabulary scan. */
  private[graft] def scoreTf(tf: DataFrame, stats: DataFrame): DataFrame =
    bm25Grouped(tf, dfOf(tf), stats, Seq("doc_id"))

  /** Document frequency per matched term — always derived from the
    * per-(doc, term) postings grain, never from a frame already
    * fanned out by queries (which would inflate df). */
  private def dfOf(tf: DataFrame): DataFrame =
    tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))

  /** The ONE BM25 scoring body, generalized over the output grain:
    * join matched rows to their term df + the 1-row stats, apply
    * [[bm25Term]], and dsum per `keys`. r1/the index probe score per
    * doc; r4 scores per (query, doc) — both MUST run this exact
    * pipeline or the eval silently measures a different scorer than
    * the one served. */
  private[graft] def bm25Grouped(matched: DataFrame, df: DataFrame,
      stats: DataFrame, keys: Seq[String]): DataFrame = {
    matched.join(broadcast(df), "tok")
      .crossJoin(broadcast(stats))
      .select((keys.map(col) :+
        bm25Term(idfCol(col("n_docs"), col("df")), col("tf"), col("dl"),
          col("avgdl")).as("term_score")): _*)
      .groupBy(keys.map(col): _*)
      .agg(dsum(col("term_score")).as("score"))
  }

  /** The per-(doc, term) matched term frequencies `(doc_id, dl, tok,
    * tf)` — also the grain of the persisted postings state. */
  private[graft] def matchedTf(docs: DataFrame,
      terms: Seq[String] = QueryTerms): DataFrame = {
    import docs.sparkSession.implicits._
    matchedToks(docs, terms)
      .groupBy($"doc_id", $"dl", $"tok")
      .agg(count(lit(1)).as("tf"))
  }

  /** Scored BM25 frame (doc_id, score) — the shared body of
    * [[r1Bm25TopK]], the fusion stage, and the `api.Retrieval`
    * facade. */
  private[graft] def bm25Scores(docs: DataFrame,
      terms: Seq[String] = QueryTerms): DataFrame =
    scoreTf(matchedTf(docs, terms), corpusStats(docs))

  private def bm25ScoresSql: String =
    s"""stats AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avgdl
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |m AS (SELECT * FROM toks WHERE tok IN ($qlist)),
       |tf AS (
       |  SELECT doc_id, dl, tok, count(*) AS tf FROM m GROUP BY 1, 2, 3),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |    ${sqlDsum(sqlBm25Term(sqlIdf("n_docs", "df"), "tf", "dl", "avgdl"))}
       |      AS score
       |  FROM tf JOIN df USING (tok) CROSS JOIN stats
       |  GROUP BY doc_id)""".stripMargin

  /** R1: BM25 top-k for the canned query — (doc_id, score), the best
    * [[TopK]] by (score desc, doc_id). Plans as scan → filtered explode
    * → two partial-agg'd groupBys over query-term postings only →
    * TakeOrderedAndProject. */
  def r1Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bm25Scores(Tables(spark, dir, "documents"))
      .orderBy($"score".desc, $"doc_id")
      .limit(TopK)
  }

  val r1Sql: String =
    s"""WITH $bm25ScoresSql
       |SELECT doc_id, score FROM scored
       |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin

  // ---------------- VSM second scorer + RRF fusion ----------------

  /** Vector-space cosine over tf·idf term vectors: the classic second
    * lexical scorer with genuinely different semantics from BM25 (doc
    * norm rewards focus; no length saturation). idf here is the plain
    * smoothed form ln(n_docs / df) over the FULL vocabulary (the doc
    * norm spans every term the doc contains, not just the query's).
    * Query vector = unit tf on each query term. */
  private[graft] def vsmScores(docs: DataFrame,
      terms: Seq[String] = QueryTerms): DataFrame = {
    import docs.sparkSession.implicits._
    val tfAll = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"))
    val vocab = tfAll.groupBy($"tok").agg(count(lit(1)).as("df"))
    val stats = corpusStats(docs)
    // ONE weighted pass (r18, guide §2.4; r17 verdict #4): the old form
    // planned the weighted subtree twice (norms branch + dot branch) and
    // paid an extra token shuffle + a doc_id join to bring dnorm and dot
    // back together. dnorm, dot and the matched flag now ride a single
    // groupBy(doc_id) over one weighted projection: the query weight is
    // the same idf expression the qw join carried (log(n_docs/df),
    // available in-row from the vocab broadcast), zeroed on non-query
    // terms — decimal dsum of exact zeros is identity, so dot is
    // bit-identical to the filtered form; the matched flag reproduces
    // the old inner join's doc universe (docs with ≥1 query term).
    val idf = log($"n_docs".cast("double") / $"df".cast("double"))
    val isQ = $"tok".isin(terms: _*)
    val weighted = tfAll
      .join(broadcast(vocab), "tok")
      .crossJoin(broadcast(stats))
      .select($"doc_id",
        ($"tf".cast("double") * idf).as("w"),
        when(isQ, idf).otherwise(lit(0.0)).as("qw"),
        when(isQ, lit(1)).otherwise(lit(0)).as("m"))
    // query weight per term = idf (tf=1); qnorm = sqrt(Σ idf²)
    val qn = vocab.crossJoin(broadcast(stats))
      .filter($"tok".isin(terms: _*))
      .select(idf.as("qw"))
      .agg(sqrt(dsum($"qw" * $"qw")).as("qnorm"))
    weighted
      .groupBy($"doc_id")
      .agg(sqrt(dsum($"w" * $"w")).as("dnorm"),
        dsum($"w" * $"qw").as("dot"),
        max($"m").as("m"))
      .filter($"m" === 1)
      .crossJoin(broadcast(qn))
      .select($"doc_id", ($"dot" / ($"dnorm" * $"qnorm")).as("score"))
  }

  private def vsmScoresSql: String =
    s"""vstats AS (SELECT count(*) AS n_docs FROM documents),
       |vtoks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |vtf AS (SELECT doc_id, tok, count(*) AS tf FROM vtoks GROUP BY 1, 2),
       |vocab AS (SELECT tok, count(*) AS df FROM vtf GROUP BY 1),
       |wtd AS (
       |  SELECT doc_id, tok,
       |    CAST(tf AS DOUBLE) *
       |      ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS w
       |  FROM vtf JOIN vocab USING (tok) CROSS JOIN vstats),
       |norms AS (
       |  SELECT doc_id, sqrt(${sqlDsum("w * w")}) AS dnorm
       |  FROM wtd GROUP BY doc_id),
       |qw AS (
       |  SELECT tok,
       |    ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS qw
       |  FROM vocab CROSS JOIN vstats WHERE tok IN ($qlist)),
       |qn AS (SELECT sqrt(${sqlDsum("qw * qw")}) AS qnorm FROM qw),
       |vsm AS (
       |  SELECT doc_id, dot / (dnorm * qnorm) AS score
       |  FROM (
       |    SELECT doc_id, ${sqlDsum("w * qw")} AS dot
       |    FROM wtd JOIN qw USING (tok) GROUP BY doc_id) d
       |  JOIN norms USING (doc_id) CROSS JOIN qn)""".stripMargin

  /** R2: reciprocal-rank fusion of the BM25 and VSM candidate pools —
    * rrf(d) = Σ 1/(60 + rank_scorer(d)) over the scorers that surfaced
    * d in their top-[[PoolSize]]. The fuse-candidate-lists form: each
    * pool is a TakeOrderedAndProject of [[PoolSize]] rows, the join is
    * pool×pool (outer, 100-row frames), never a full-corpus ranking.
    * Output: top-[[TopK]] by (rrf desc, doc_id) with both ranks
    * (0 = absent from that pool). */
  /** The generalized fusion body — also the `api.Retrieval` surface. */
  private[graft] def rrfHybridFrom(docs: DataFrame,
      terms: Seq[String] = QueryTerms, poolSize: Int = PoolSize,
      topK: Int = TopK): DataFrame = {
    import docs.sparkSession.implicits._
    def pool(scored: DataFrame): DataFrame = {
      val top = scored.orderBy($"score".desc, $"doc_id").limit(poolSize)
      // rank within a poolSize-row frame: single-partition window, free
      top.select($"doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"score".desc, $"doc_id")).as("rank"))
    }
    val b = pool(bm25Scores(docs, terms)).withColumnRenamed("rank", "bm25_rank")
    val v = pool(vsmScores(docs, terms)).withColumnRenamed("rank", "vsm_rank")
    b.join(v, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        coalesce($"bm25_rank", lit(0)).as("bm25_rank"),
        coalesce($"vsm_rank", lit(0)).as("vsm_rank"))
      .withColumn("rrf",
        when($"bm25_rank" > 0,
          lit(1.0) / (lit(RrfK).cast("double") + $"bm25_rank".cast("double")))
          .otherwise(lit(0.0)) +
          when($"vsm_rank" > 0,
            lit(1.0) / (lit(RrfK).cast("double") + $"vsm_rank".cast("double")))
            .otherwise(lit(0.0)))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(topK)
  }

  def r2RrfHybrid(spark: SparkSession, dir: String): DataFrame =
    rrfHybridFrom(Tables(spark, dir, "documents"))

  val r2Sql: String =
    s"""WITH $bm25ScoresSql,
       |$vsmScoresSql,
       |bpool AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
       |      AS bm25_rank
       |  FROM (SELECT * FROM scored ORDER BY score DESC, doc_id
       |        LIMIT $PoolSize) s),
       |vpool AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
       |      AS vsm_rank
       |  FROM (SELECT * FROM vsm ORDER BY score DESC, doc_id
       |        LIMIT $PoolSize) s)
       |SELECT doc_id, bm25_rank, vsm_rank, rrf FROM (
       |  SELECT doc_id,
       |    coalesce(bm25_rank, 0) AS bm25_rank,
       |    coalesce(vsm_rank, 0) AS vsm_rank,
       |    (CASE WHEN coalesce(bm25_rank, 0) > 0
       |      THEN 1.0 / (CAST($RrfK AS DOUBLE) + CAST(bm25_rank AS DOUBLE))
       |      ELSE 0.0 END) +
       |    (CASE WHEN coalesce(vsm_rank, 0) > 0
       |      THEN 1.0 / (CAST($RrfK AS DOUBLE) + CAST(vsm_rank AS DOUBLE))
       |      ELSE 0.0 END) AS rrf
       |  FROM bpool FULL OUTER JOIN vpool USING (doc_id)) f
       |ORDER BY rrf DESC, doc_id LIMIT $TopK""".stripMargin

  // ---------------- R3: exact-phrase occurrence count ----------------

  /** The canned probe phrase (a token sequence, matched exactly; a
    * bigram with ~45 corpus hits, so the oracle row verifies dozens of
    * counts rather than a near-empty result). */
  val PhraseTerms: Seq[String] = Seq("table", "hash")

  /** R3: exact-phrase counting — per document, how many times the
    * token sequence [[PhraseTerms]] occurs contiguously: the
    * phrase-level contamination probe (a benchmark's exact wording
    * inside training text) that term-level BM25 cannot answer and the
    * d11 span machinery over-answers. Pure scan-side: tokenize once,
    * count the window starts where every phrase position matches —
    * an integer fold over the token array, no shuffle before the
    * result filter; the same `arrays_overlap`-style pre-check prunes
    * docs missing the first term before the positional fold runs.
    * All-integer output (doc_id, n_occurrences), zero float surface. */
  def r3From(docs: DataFrame, phrase: Seq[String] = PhraseTerms): DataFrame = {
    import docs.sparkSession.implicits._
    val counter = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PhraseCount(
        org.apache.spark.sql.GraftColumnBridge.expression($"toks"), phrase))
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(array_contains($"toks", phrase.head))
      .select($"doc_id", counter.as("n_occurrences"))
      .filter($"n_occurrences" > 0)
  }

  /** The HOF twin of [[r3From]]'s kernel — kept as the executable
    * specification [[graft.functions.PhraseCount]] is property-tested
    * against (and the shape the DuckDB twin mirrors). The CASE guards
    * docs shorter than the phrase: Spark's sequence(0, negative)
    * DESCENDS and ANSI mode errors on the resulting negative
    * subscripts (DuckDB's range is naturally empty there). */
  private[graft] def r3HofFrom(docs: DataFrame,
      phrase: Seq[String] = PhraseTerms): DataFrame = {
    import docs.sparkSession.implicits._
    val conds = phrase.zipWithIndex.map { case (t, j) =>
      s"toks[i + $j] = '$t'"
    }.mkString(" AND ")
    docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(array_contains($"toks", phrase.head))
      .select($"doc_id",
        expr(
          s"""CASE WHEN size(toks) < ${phrase.size} THEN 0
             |ELSE size(filter(sequence(0, size(toks) - ${phrase.size}),
             |  i -> $conds)) END""".stripMargin).cast("long")
          .as("n_occurrences"))
      .filter($"n_occurrences" > 0)
  }

  def r3PhraseCount(spark: SparkSession, dir: String): DataFrame =
    r3From(Tables(spark, dir, "documents"))

  val r3Sql: String = {
    // DuckDB lists are 1-based; the window start runs over the same
    // logical positions as the Spark fold
    val conds = PhraseTerms.zipWithIndex.map { case (t, j) =>
      s"toks[i + $j] = '$t'"
    }.mkString(" AND ")
    s"""SELECT doc_id, n_occurrences FROM (
       |  SELECT doc_id,
       |    len(list_filter(range(1, len(toks) - ${PhraseTerms.size - 1} + 1),
       |      i -> $conds)) AS n_occurrences
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
       |        FROM documents))
       |WHERE n_occurrences > 0""".stripMargin
  }

  // ---------------- r4: retrieval-quality evaluation ----------------

  /** Self-retrieval query count, query length (leading tokens), and
    * metric cutoff. */
  val EvalQueries = 20
  val EvalTerms = 5
  val EvalK = 10

  /** nDCG@k gain table 1/log2(rank+1), precomputed once in Scala and
    * embedded as IDENTICAL double literals in both engines — rank is a
    * small integer, so a lookup removes libm's log from the parity
    * surface entirely. */
  private val NdcgGain: Seq[(Int, Double)] =
    (1 to EvalK).map(r => r -> 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** R4: retrieval-quality metrics by deterministic SELF-RETRIEVAL —
    * the standard sanity benchmark when no labeled judgments exist:
    * each probe query is a document's own leading [[EvalTerms]] tokens
    * (deduplicated), its one relevant document is itself, and the
    * metric is where BM25 ranks it. Query set = the [[EvalQueries]]
    * documents first in md5(doc_id) order (bounded at any corpus
    * size, unbiased by ingest order). Output: one row — n_queries,
    * MRR, recall@[[EvalK]], nDCG@[[EvalK]].
    *
    * Scale posture: queries are a ≤[[EvalQueries]]-row broadcast and
    * their term union ≤ [[EvalQueries]]·[[EvalTerms]] terms; the
    * corpus-side explode is fenced by the same two-stage pruning as r1
    * (an `arrays_overlap` row filter against the broadcast term set
    * BEFORE the explode, then the postings join) — so the shuffled
    * state is O(postings of ≤100 terms), and the per-query ranking
    * window is bounded by those postings' documents. */
  def r4From(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks0 = docs.select($"doc_id", split($"text", " ").as("toks"))
    val queries = toks0
      .filter(size($"toks") >= EvalTerms)
      .select($"doc_id".as("qid"),
        array_distinct(slice($"toks", 1, EvalTerms)).as("qtoks"),
        md5($"doc_id".cast("string").cast("binary")).as("h"))
      .orderBy($"h", $"qid").limit(EvalQueries)
      .drop("h")
    val qterms = queries.select($"qid", explode($"qtoks").as("tok"))
    val terms = qterms.select($"tok").distinct()
    val termSet = terms.agg(collect_set($"tok").as("qterm_set"))
    val tf = toks0
      .crossJoin(broadcast(termSet))
      .filter(arrays_overlap($"toks", $"qterm_set"))
      .select($"doc_id", size($"toks").cast("long").as("dl"),
        explode($"toks").as("tok"))
      .join(broadcast(terms), "tok")
      .groupBy($"doc_id", $"dl", $"tok")
      .agg(count(lit(1)).as("tf"))
    val scored = bm25Grouped(qterms.join(tf, "tok"), dfOf(tf),
      corpusStats(docs), Seq("qid", "doc_id"))
    val ranked = scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"qid").orderBy($"score".desc, $"doc_id")))
    val self = ranked.filter($"qid" === $"doc_id")
    val gain = NdcgGain.foldLeft(lit(0.0)) { case (acc, (r, v)) =>
      when($"rank" === r, lit(v)).otherwise(acc)
    }
    self.agg(
      count(lit(1)).as("n_queries"),
      davg(lit(1.0) / $"rank").as("mrr"),
      davg(when($"rank" <= EvalK, lit(1.0)).otherwise(lit(0.0)))
        .as(s"recall_at_$EvalK"),
      davg(gain).as(s"ndcg_at_$EvalK"))
  }

  def r4RetrievalMetrics(spark: SparkSession, dir: String): DataFrame =
    r4From(Tables(spark, dir, "documents"))

  val r4Sql: String = {
    val gainCase = NdcgGain.map { case (r, v) =>
      s"WHEN $r THEN CAST($v AS DOUBLE)"
    }.mkString(" ")
    s"""WITH toks0 AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |q AS (
       |  SELECT doc_id AS qid,
       |    list_distinct(list_slice(toks, 1, $EvalTerms)) AS qtoks
       |  FROM toks0 WHERE len(toks) >= $EvalTerms
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), qid LIMIT $EvalQueries),
       |qt AS (SELECT qid, unnest(qtoks) AS tok FROM q),
       |terms AS (SELECT DISTINCT tok FROM qt),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avgdl
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS tok
       |  FROM toks0),
       |tf AS (
       |  SELECT doc_id, dl, tok, count(*) AS tf FROM toks
       |  WHERE tok IN (SELECT tok FROM terms) GROUP BY 1, 2, 3),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT qid, doc_id,
       |    ${sqlDsum(sqlBm25Term(sqlIdf("n_docs", "df"), "tf", "dl", "avgdl"))}
       |      AS score
       |  FROM qt JOIN tf USING (tok) JOIN dft USING (tok) CROSS JOIN stats
       |  GROUP BY qid, doc_id),
       |ranked AS (
       |  SELECT qid, doc_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
       |      AS rank
       |  FROM scored),
       |self AS (SELECT rank FROM ranked WHERE qid = doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  ${sqlDavg("1 / CAST(rank AS DOUBLE)")} AS mrr,
       |  ${sqlDavg(s"CASE WHEN rank <= $EvalK THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END")} AS recall_at_$EvalK,
       |  ${sqlDavg(s"CASE rank $gainCase ELSE CAST(0.0 AS DOUBLE) END")} AS ndcg_at_$EvalK
       |FROM self""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "r1_bm25_topk" -> QueryDef.of(r1Sql)(r1Bm25TopK),
    "r2_rrf_hybrid" -> QueryDef.of(r2Sql)(r2RrfHybrid),
    "r3_phrase_count" -> QueryDef.of(r3Sql)(r3PhraseCount),
    "r4_retrieval_metrics" -> QueryDef.of(r4Sql)(r4RetrievalMetrics)
  )
}
