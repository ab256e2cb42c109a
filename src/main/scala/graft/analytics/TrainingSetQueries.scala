package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set construction operators — the steps between "corpus" and
  * "training mix" in an LLM data pipeline: deterministic sampling,
  * dataset mixture weighting, benchmark decontamination, repetition
  * filtering, and PII redaction.
  *
  * Scale posture (100 TB): ds1/ds2/t_repetition/t_redact are pure
  * per-row transforms plus one final aggregation — they stream at scan
  * speed with a single shuffle. d6's benchmark gram set is tiny relative
  * to the corpus by construction (benchmarks are MBs, corpora are TBs),
  * so the contamination probe is a broadcast semi-join: the 100 TB side
  * never shuffles.
  */
object TrainingSetQueries {

  /** Deterministic 0..99 bucket from the doc id — md5-based so Spark
    * and DuckDB agree bit-for-bit, and stable across runs/retries
    * (rand() sampling is neither reproducible nor oracle-checkable). */
  private def hashBucket(c: Column): Column =
    DedupQueries.hash60(c.cast("string")) % 100

  private def sqlHashBucket(e: String): String =
    s"${DedupQueries.sqlHash60(s"CAST($e AS VARCHAR)")} % 100"

  /** Per-language sampling rates (percent). A real pipeline derives
    * these from token budgets; the operator contract is the same. */
  private val langRates: Seq[(String, Int)] =
    Seq("en" -> 60, "es" -> 35, "de" -> 35, "fr" -> 20, "zh" -> 10)

  /** DS1: stratified deterministic sampling — keep a per-language
    * fraction of documents, chosen by content-stable hash so every
    * re-run (and every engine) selects the same rows. The filter is a
    * scan-side predicate: no shuffle until the final aggregate. */
  def ds1HashSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = langRates.foldRight(lit(0)) { case ((l, r), rest) =>
      when($"lang" === l, lit(r)).otherwise(rest)
    }
    Tables(spark, dir, "documents")
      .filter(hashBucket($"doc_id") < rate)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"),
        davg($"n_chars".cast("double")).as("avg_chars"))
  }

  val ds1Sql: String = {
    val caseExpr = langRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")
    s"""SELECT lang, count(*) AS n_sampled,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  ${sqlDavg("CAST(n_chars AS DOUBLE)")} AS avg_chars
       |FROM documents
       |WHERE ${sqlHashBucket("doc_id")} < (CASE $caseExpr ELSE 0 END)
       |GROUP BY lang""".stripMargin
  }

  /** Mixture component → (member sources, sampling rate %). */
  private val mixture: Seq[(String, Seq[String], Int)] = Seq(
    ("web", (0 until 10).map(i => s"src$i"), 80),
    ("books", (10 until 20).map(i => s"src$i"), 25))

  /** DS2: dataset mixture weighting — tag each document with its
    * mixture component, apply the component's sampling rate, and report
    * the realized mix. Logically a weighted union of datasets; executed
    * as ONE scan with a tag column (a k-way union of filters of the
    * same table would scan k times). */
  def ds2Mixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tag = mixture.foldRight(lit(null).cast("string")) {
      case ((name, srcs, _), rest) =>
        when($"source".isin(srcs: _*), lit(name)).otherwise(rest)
    }
    val rate = mixture.foldRight(lit(0)) { case ((name, _, r), rest) =>
      when($"component" === name, lit(r)).otherwise(rest)
    }
    Tables(spark, dir, "documents")
      .withColumn("component", tag)
      .filter(hashBucket($"doc_id") < rate)
      .groupBy($"component", $"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"))
  }

  val ds2Sql: String = {
    val tagCase = mixture.map { case (name, srcs, _) =>
      val inList = srcs.map(s => s"'$s'").mkString(", ")
      s"WHEN source IN ($inList) THEN '$name'"
    }.mkString(" ")
    val rateCase = mixture
      .map { case (name, _, r) => s"WHEN component = '$name' THEN $r" }
      .mkString(" ")
    s"""SELECT component, lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM (
       |  SELECT *, CASE $tagCase ELSE NULL END AS component
       |  FROM documents)
       |WHERE ${sqlHashBucket("doc_id")} < (CASE $rateCase ELSE 0 END)
       |GROUP BY component, lang""".stripMargin
  }

  /** Contamination n-gram width. Real pipelines use 8-13 tokens; the
    * synthetic corpus has a tiny vocabulary, so 5 keeps the benchmark
    * gram set selective enough to be a meaningful test. */
  private val decontamN = 5

  /** `carry` rides doc-level columns (functionally dependent on doc_id,
    * e.g. lang) through the explosion so downstream aggregations can
    * group by them without a join back to the corpus. */
  private[graft] def gramHashes(docs: DataFrame, n: Int,
      carry: Seq[String] = Nil): DataFrame = {
    import docs.sparkSession.implicits._
    val carried = carry.map(col)
    docs
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= n)
      .select(($"doc_id" +: carried) :+ explode(expr(
        s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', slice(toks, i+1, $n)))"))
        .as("gram"): _*)
      .select(($"doc_id" +: carried) :+
        DedupQueries.hash60($"gram").as("h"): _*)
  }

  /** D6: benchmark decontamination — flag every training document that
    * shares at least one [[decontamN]]-gram with the held-out benchmark
    * split (source `src0` stands in for the eval set). The benchmark
    * gram set is distinct-ed and broadcast; the corpus side is a
    * broadcast LEFT SEMI probe followed by one aggregate — the corpus
    * is never shuffled by gram. */
  def d6Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    val benchGrams = gramHashes(docs.filter($"source" === "src0"), decontamN)
      .select($"h").distinct()
    val train = docs.filter($"source" =!= "src0")
    val contaminated = gramHashes(train, decontamN)
      .join(broadcast(benchGrams), Seq("h"), "leftsemi")
      .select($"doc_id").distinct()
      .withColumn("contaminated", lit(1L))
    train
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_train"),
        sum(coalesce($"contaminated", lit(0L))).as("n_contaminated"),
        (count(lit(1)) - sum(coalesce($"contaminated", lit(0L)))).as("n_clean"))
  }

  val d6Sql: String = {
    val n = decontamN
    val gramExpr =
      s"unnest(list_transform(range(len(t) - ${n - 1}), i -> " +
        s"concat_ws(' ', ${(1 to n).map(j => s"t[i+$j]").mkString(", ")})))"
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
       |  WHERE len(string_split(text, ' ')) >= $n),
       |grams AS (
       |  SELECT doc_id, source, ${DedupQueries.sqlHash60("gram")} AS h FROM (
       |    SELECT doc_id, source, $gramExpr AS gram FROM toks)),
       |bench AS (SELECT DISTINCT h FROM grams WHERE source = 'src0'),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM grams
       |  WHERE source <> 'src0' AND h IN (SELECT h FROM bench))
       |SELECT d.lang, count(*) AS n_train,
       |  CAST(count(c.doc_id) AS BIGINT) AS n_contaminated,
       |  CAST(count(*) - count(c.doc_id) AS BIGINT) AS n_clean
       |FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
       |WHERE d.source <> 'src0'
       |GROUP BY d.lang""".stripMargin
  }

  /** Max frequency of any element in `arr`, computed as the longest run
    * of equal adjacent values in a sorted copy: O(n log n) per document
    * instead of the former |distinct|×n transform×filter scan, which was
    * quadratic on repetitive book-length docs (a 10k-token doc cost ~10⁸
    * comparisons). Scan-side, no shuffle. */
  private def maxFreqExpr(arr: String): String =
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run',  if(x <=> acc.prev, acc.run + 1L, 1L),
       |    'best', greatest(acc.best, if(x <=> acc.prev, acc.run + 1L, 1L))),
       |  acc -> acc.best)""".stripMargin

  /** T-REP: Gopher-style repetition metrics per document — duplicate
    * word fraction, most-frequent-token fraction, most-frequent-bigram
    * fraction, and the keep/drop verdict. Pure array math per row; the
    * per-doc top frequency is sort + max-run-length, never a shuffle
    * and never quadratic. */
  def tRepetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .withColumn("toks", split($"text", " "))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .filter($"n_tokens" >= 2)
      .withColumn("n_distinct", size(array_distinct($"toks")).cast("long"))
      .withColumn("top_tok", expr(maxFreqExpr("toks")).cast("long"))
      .withColumn("grams2", expr(
        "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
      .withColumn("top_bigram", expr(maxFreqExpr("grams2")).cast("long"))
      .select(
        $"doc_id", $"n_tokens",
        (lit(1.0) - $"n_distinct".cast("double") / $"n_tokens").as("dup_word_frac"),
        ($"top_tok".cast("double") / $"n_tokens").as("top_tok_frac"),
        ($"top_bigram".cast("double") / ($"n_tokens" - 1)).as("top_bigram_frac"),
        ($"top_tok".cast("double") / $"n_tokens" < 0.2 &&
          $"top_bigram".cast("double") / ($"n_tokens" - 1) < 0.1).as("keep"))
  }

  val tRepetitionSql: String =
    """WITH base AS (
      |  SELECT doc_id, t,
      |    list_transform(range(len(t) - 1),
      |      i -> concat_ws(' ', t[i+1], t[i+2])) AS g2
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 2),
      |tok_top AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_tok FROM (
      |    SELECT doc_id, tok, count(*) AS c
      |    FROM (SELECT doc_id, unnest(t) AS tok FROM base)
      |    GROUP BY doc_id, tok)
      |  GROUP BY doc_id),
      |big_top AS (
      |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram FROM (
      |    SELECT doc_id, g, count(*) AS c
      |    FROM (SELECT doc_id, unnest(g2) AS g FROM base)
      |    GROUP BY doc_id, g)
      |  GROUP BY doc_id),
      |stats AS (
      |  SELECT b.doc_id,
      |    CAST(len(b.t) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(b.t)) AS BIGINT) AS n_distinct,
      |    tk.top_tok, bg.top_bigram
      |  FROM base b
      |  JOIN tok_top tk ON b.doc_id = tk.doc_id
      |  JOIN big_top bg ON b.doc_id = bg.doc_id)
      |SELECT doc_id, n_tokens,
      |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_word_frac,
      |  CAST(top_tok AS DOUBLE) / n_tokens AS top_tok_frac,
      |  CAST(top_bigram AS DOUBLE) / (n_tokens - 1) AS top_bigram_frac,
      |  (CAST(top_tok AS DOUBLE) / n_tokens < 0.2
      |    AND CAST(top_bigram AS DOUBLE) / (n_tokens - 1) < 0.1) AS keep
      |FROM stats""".stripMargin

  /** Redaction pattern set: (class, regex, replacement). Same regex
    * dialect subset works in java.util.regex and RE2. */
  private val redactions: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("number", "[0-9]+", "<NUM>"))

  /** T-REDACT: PII-shape redaction over the event payloads — count
    * matches per pattern class, apply the replacements in order, and
    * prove the rewritten payloads identical across engines via a
    * per-group digest. Patterns that cannot occur in this corpus
    * (email, ipv4) are still evaluated: their zero counts are part of
    * the oracle check. */
  def tRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counted = redactions.foldLeft(Tables(spark, dir, "events")) {
      case (df, (cls, pat, _)) =>
        df.withColumn(s"n_$cls",
          size(regexp_extract_all($"props", lit(pat), lit(0))).cast("long"))
    }
    val redacted = redactions.foldLeft(col("props")) {
      case (c, (_, pat, rep)) => regexp_replace(c, pat, rep)
    }
    counted
      .withColumn("redacted", redacted)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        redactions.map { case (cls, _, _) =>
          sum(col(s"n_$cls")).as(s"sum_$cls")
        } :+ min(md5($"redacted")).as("digest"): _*)
  }

  val tRedactSql: String = {
    val counts = redactions.map { case (cls, pat, _) =>
      s"CAST(sum(len(regexp_extract_all(props, '$pat', 0))) AS BIGINT) AS sum_$cls"
    }.mkString(",\n  ")
    val redacted = redactions.foldLeft("props") {
      case (e, (_, pat, rep)) => s"regexp_replace($e, '$pat', '$rep', 'g')"
    }
    s"""SELECT event_type, count(*) AS n_events,
       |  $counts,
       |  min(md5($redacted)) AS digest
       |FROM events GROUP BY event_type""".stripMargin
  }

  /** PII classes for the document-level detection report — a superset of
    * the redaction set (same dual-dialect regex subset: java.util.regex
    * and RE2 read these identically). */
  private val piiClasses: Seq[(String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", "\\+[0-9]{7,15}"),
    ("number", "[0-9]+"))

  /** T-PII-REPORT: the dashboard twin of t_redact — instead of rewriting
    * text, report per (source × PII class): documents scanned, documents
    * with ≥1 hit, and total hits. This is the audit a pipeline runs
    * BEFORE deciding to redact/drop; classes absent from this synthetic
    * corpus prove their zero counts against the oracle. One scan: all
    * class counts are computed as columns, then unpivoted with `stack`
    * (no per-class re-scan), and the aggregate is partial-final. */
  def tPiiReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counted = piiClasses.foldLeft(Tables(spark, dir, "documents")) {
      case (df, (cls, pat)) =>
        df.withColumn(s"n_$cls",
          size(regexp_extract_all($"text", lit(pat), lit(0))).cast("long"))
    }
    val stackArgs = piiClasses
      .map { case (cls, _) => s"'$cls', n_$cls" }.mkString(", ")
    counted
      .select($"source", expr(
        s"stack(${piiClasses.size}, $stackArgs) AS (pii_class, n)"))
      .groupBy($"source", $"pii_class")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"n" > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum($"n").as("n_hits"))
  }

  val tPiiReportSql: String = {
    val hitCols = piiClasses.map { case (cls, pat) =>
      s"len(regexp_extract_all(text, '$pat', 0)) AS n_$cls"
    }.mkString(",\n    ")
    val unpivot = piiClasses.map { case (cls, _) =>
      s"SELECT source, '$cls' AS pii_class, n_$cls AS n FROM hits"
    }.mkString("\n  UNION ALL ")
    s"""WITH hits AS (
       |  SELECT source,
       |    $hitCols
       |  FROM documents)
       |SELECT source, pii_class, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  CAST(sum(n) AS BIGINT) AS n_hits
       |FROM (
       |  $unpivot)
       |GROUP BY source, pii_class""".stripMargin
  }

  /** DS3: deterministic corpus shuffle — the pre-epoch ordering every
    * training run needs: order by a salted content hash, so the
    * permutation is reproducible (resume mid-epoch, re-run a failed
    * job, audit what the model saw) and changes per epoch by salt. At
    * scale the full shuffle is `repartitionByRange(pos_key)` +
    * `sortWithinPartitions` writing the epoch out — no single-partition
    * sort anywhere; the oracle-checked head here is TakeOrdered (heap,
    * not total sort). */
  def ds3Shuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables(spark, dir, "documents")
      .select($"doc_id", $"source",
        DedupQueries.hash60(concat($"doc_id".cast("string"), lit("|epoch0")))
          .as("pos_key"))
    val head = keyed.orderBy($"pos_key", $"doc_id").limit(100)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"pos_key", $"doc_id")
    head.withColumn("position", row_number().over(w).cast("long"))
  }

  val ds3Sql: String =
    s"""SELECT doc_id, source, pos_key,
       |  row_number() OVER (ORDER BY pos_key, doc_id) AS position
       |FROM (
       |  SELECT doc_id, source,
       |    ${DedupQueries.sqlHash60("CAST(doc_id AS VARCHAR) || '|epoch0'")} AS pos_key
       |  FROM documents
       |  ORDER BY pos_key, doc_id LIMIT 100)""".stripMargin

  /** Per-language token budget for [[ds4TokenBudget]] — sized so the
    * selection is a strict prefix at every test SF (the budget, not the
    * corpus, bounds the output). */
  private val tokenBudget = 5000L

  /** DS4: token-budget mixture selection — THE pretraining-mix
    * primitive: each language contributes documents, in a deterministic
    * pseudo-random order, until its token budget fills. The order key is
    * the same salted content hash the epoch shuffle uses (reproducible
    * under retries/resume — `rand()` is neither); selection is the
    * prefix whose running token total stays ≤ budget, so the picked set
    * is a pure function of (corpus, salt, budget).
    *
    * Shape: one scan computes per-doc token counts; the running total is
    * a window PARTITIONED BY lang — languages pack in parallel, and the
    * per-language sort is |docs-per-lang|, never a global sort. At
    * 100 TB the window input is (doc_id, n_tokens, key) triples — the
    * text never shuffles. */
  def ds4TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"pick_key", $"doc_id")
    Tables(spark, dir, "documents")
      .select($"lang", $"doc_id",
        size(split($"text", " ")).cast("long").as("n_tokens"),
        DedupQueries.hash60(concat($"doc_id".cast("string"), lit("|mix0")))
          .as("pick_key"))
      .withColumn("cum_tokens", sum($"n_tokens").over(w))
      .filter($"cum_tokens" <= tokenBudget)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        (max($"cum_tokens").cast("double") / tokenBudget).as("utilization"))
  }

  val ds4Sql: String =
    s"""WITH keyed AS (
       |  SELECT lang, doc_id,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    ${DedupQueries.sqlHash60("CAST(doc_id AS VARCHAR) || '|mix0'")} AS pick_key
       |  FROM documents),
       |cum AS (
       |  SELECT lang, doc_id, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY pick_key, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM keyed)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(max(cum_tokens) AS DOUBLE) / $tokenBudget AS utilization
       |FROM cum WHERE cum_tokens <= $tokenBudget
       |GROUP BY lang""".stripMargin

  /** DSIR selection size. */
  private val dsirTopK = 100

  /** DS5: data selection via importance resampling (DSIR, Xie et al.
    * 2023, arXiv:2302.03169) — the standard recipe for skewing a raw
    * crawl toward a target domain: fit one unigram LM on the target
    * split (`src0`, the same held-out convention d6 uses) and one on
    * the raw pool, score every raw document by its log importance
    * weight `log w(d) = Σ_tok tf·(ln p_target − ln p_raw)` (both
    * add-one smoothed over the shared vocabulary), and keep the top-K.
    *
    * Scale posture (100 TB): tokens reduce to per-doc term frequencies
    * FIRST (the one wide shuffle, keyed by (doc, tok)), so the vocab
    * join moves (doc_id, tok, tf) triples — never text. The vocabulary
    * itself is Zipf-bounded (≪ corpus size) and its totals row is a
    * broadcast. Top-K is `orderBy.limit` — TakeOrderedAndProject, a
    * per-partition heap + driver merge of K rows, never a global sort;
    * the rank window then runs over K rows, not the corpus. Per-token
    * log-probs are deterministic IEEE scalars; the per-doc sum runs
    * through the exact-decimal accumulator so summation order cannot
    * break oracle parity.
    *
    * Ref: the reference has no data-selection stage; this extends its
    * funnel/segmentation analytics toward the LLM-pipeline surface
    * (SURVEY.md §2 "beyond the reference" mandate). */
  def ds5Dsir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = dsirScoresFrom(
      Tables(spark, dir, "documents"), col("source") === "src0")
      .orderBy($"log_w".desc, $"doc_id".asc)
      .limit(dsirTopK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"log_w".desc, $"doc_id".asc)
    topk
      .withColumn("rk", row_number().over(w).cast("long"))
      .select($"rk", $"doc_id", $"n_tokens", $"log_w")
  }

  /** The ONE DSIR scoring implementation — shared by the registry query
    * and [[graft.api.TrainingSet.dsirScores]]: per-raw-doc log
    * importance weight under target-vs-raw add-one-smoothed unigram
    * LMs. `targetPred` splits the corpus; rows satisfying it train the
    * target LM and are not scored. */
  private[graft] def dsirScoresFrom(docs: DataFrame,
      targetPred: Column): DataFrame = {
    import docs.sparkSession.implicits._
    val tf = docs
      .withColumn("is_target", targetPred)
      .select($"doc_id", $"is_target",
        explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"is_target", $"tok")
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy($"tok").agg(
      sum(when($"is_target", $"tf").otherwise(0L)).as("cnt_t"),
      sum(when(!$"is_target", $"tf").otherwise(0L)).as("cnt_r"))
    val totals = vocab.agg(
      sum($"cnt_t").as("tot_t"),
      sum($"cnt_r").as("tot_r"),
      count(lit(1)).as("v"))
    tf.filter(!$"is_target")
      .join(vocab, "tok")
      .crossJoin(broadcast(totals))
      .select($"doc_id", $"tf",
        (log(($"cnt_t" + 1L).cast("double") / ($"tot_t" + $"v").cast("double")) -
          log(($"cnt_r" + 1L).cast("double") / ($"tot_r" + $"v").cast("double")))
          .as("lr"))
      .groupBy($"doc_id")
      .agg(
        sum($"tf").as("n_tokens"),
        dsum($"tf".cast("double") * $"lr").as("log_w"))
  }

  val ds5Sql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, source = 'src0' AS is_target, tok,
       |    count(*) AS tf
       |  FROM (SELECT doc_id, source,
       |          unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  GROUP BY 1, 2, 3),
       |vocab AS (
       |  SELECT tok,
       |    sum(CASE WHEN is_target THEN tf ELSE 0 END) AS cnt_t,
       |    sum(CASE WHEN NOT is_target THEN tf ELSE 0 END) AS cnt_r
       |  FROM tf GROUP BY tok),
       |totals AS (
       |  SELECT sum(cnt_t) AS tot_t, sum(cnt_r) AS tot_r,
       |    count(*) AS v
       |  FROM vocab),
       |scored AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |    ${sqlDsum("CAST(tf AS DOUBLE) * (" +
           "ln(CAST(cnt_t + 1 AS DOUBLE) / CAST(tot_t + v AS DOUBLE)) - " +
           "ln(CAST(cnt_r + 1 AS DOUBLE) / CAST(tot_r + v AS DOUBLE)))")} AS log_w
       |  FROM tf JOIN vocab USING (tok) CROSS JOIN totals
       |  WHERE NOT is_target
       |  GROUP BY doc_id)
       |SELECT CAST(row_number() OVER (ORDER BY log_w DESC, doc_id ASC) AS BIGINT) AS rk,
       |  doc_id, n_tokens, log_w
       |FROM scored
       |ORDER BY log_w DESC, doc_id ASC
       |LIMIT $dsirTopK""".stripMargin

  /** DS6: temperature-scaled mixture shares — the multilingual
    * pretraining recipe (XLM/mT5 style): sampling probability per
    * source ∝ (token share)^α with α = 0.5, which up-weights small
    * sources relative to their raw share. α is fixed at 1/2 so the
    * exponentiation is `sqrt` — IEEE-754 *correctly rounded* on both
    * engines, unlike `pow` whose libm results can differ by an ulp.
    * The share normalizer Σ√nₛ runs through the exact-decimal
    * accumulator, so the result is engine-exact.
    *
    * Scale posture (100 TB): one partial-agg'd scan to per-source token
    * counts (|sources| rows), a 1-row totals broadcast, arithmetic on
    * the aggregate grain — the corpus text never moves. */
  def ds6Temperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables(spark, dir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"))
    val totals = per.agg(
      sum($"n_tokens").as("tot_tokens"),
      dsum(sqrt($"n_tokens".cast("double"))).as("tot_sqrt"))
    per.crossJoin(broadcast(totals))
      .select($"source", $"n_docs", $"n_tokens",
        ($"n_tokens".cast("double") / $"tot_tokens".cast("double"))
          .as("raw_share"),
        (sqrt($"n_tokens".cast("double")) / $"tot_sqrt").as("temp_share"),
        ((sqrt($"n_tokens".cast("double")) / $"tot_sqrt") /
          ($"n_tokens".cast("double") / $"tot_tokens".cast("double")))
          .as("boost"))
  }

  val ds6Sql: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |totals AS (
       |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
       |    ${sqlDsum("sqrt(CAST(n_tokens AS DOUBLE))")} AS tot_sqrt
       |  FROM per)
       |SELECT source, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS raw_share,
       |  sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt AS temp_share,
       |  (sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt) /
       |    (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)) AS boost
       |FROM per CROSS JOIN totals""".stripMargin

  /** Blocklist classes: (class, member words). The corpus vocabulary is
    * synthetic, so in-corpus tokens stand in for each class's word list
    * (the same stand-in convention src0 uses for "the benchmark");
    * the operator contract — broadcast list, per-doc match counts,
    * drop-on-any-hit — is exactly C4's badwords filter. */
  private val blocklist: Seq[(String, Seq[String])] = Seq(
    ("unsafe", Seq("slow", "dup")),
    ("spam", Seq("fast", "big", "small")))

  /** T-BLOCKLIST: C4-style blocklist filtering report — count each
    * document's matches per blocklist class and drop the doc on ANY
    * hit (C4 removes the whole page, not the line). Reported per
    * (lang × class): docs hit, total hits, plus the per-lang drop
    * rate every class contributes to.
    *
    * Scale posture (100 TB): the word list is a broadcast scalar
    * expression (array_intersect-free: per-class counts are a fold over
    * the token array) — pure scan-side math, one final aggregate
    * shuffle at the (lang, class) grain. Adding a class adds a column,
    * not a scan. */
  def tBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counted = blocklist.foldLeft(
      Tables(spark, dir, "documents").withColumn("toks", split($"text", " "))) {
      case (df, (cls, words)) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        df.withColumn(s"n_$cls",
          size(expr(s"filter(toks, t -> t IN ($inList))")).cast("long"))
    }
    val anyHit = blocklist
      .map { case (cls, _) => col(s"n_$cls") > 0L }
      .reduce(_ || _)
    val stackArgs = blocklist
      .map { case (cls, _) => s"'$cls', n_$cls" }.mkString(", ")
    counted
      .withColumn("dropped", anyHit)
      .select(col("lang"), col("doc_id"), col("dropped"),
        expr(s"stack(${blocklist.size}, $stackArgs) AS (block_class, n_hits)"))
      .groupBy($"lang", $"block_class")
      .agg(
        sum(when($"n_hits" > 0L, 1L).otherwise(0L)).as("docs_hit"),
        sum($"n_hits").as("total_hits"),
        (sum(when($"dropped", 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("drop_rate"))
  }

  val tBlocklistSql: String = {
    val cols = blocklist.map { case (cls, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($inList))) AS n_$cls"
    }.mkString(",\n    ")
    val anyHit = blocklist
      .map { case (cls, _) => s"n_$cls > 0" }.mkString(" OR ")
    val unpivot = blocklist
      .map { case (cls, _) =>
        s"SELECT lang, doc_id, dropped, '$cls' AS block_class, n_$cls AS n_hits FROM counted" }
      .mkString("\n  UNION ALL ")
    s"""WITH counted AS (
       |  SELECT lang, doc_id,
       |    $cols,
       |    ($anyHit) AS dropped
       |  FROM (SELECT lang, doc_id, string_split(text, ' ') AS toks
       |        FROM documents)),
       |stacked AS (
       |  $unpivot)
       |SELECT lang, block_class,
       |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit,
       |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
       |  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS drop_rate
       |FROM stacked
       |GROUP BY lang, block_class""".stripMargin
  }

  /** DS7: leak-proof train/validation/test split — every document lands
    * in exactly one split by a salted content-stable hash of its id
    * (80/10/10), so the assignment is deterministic across runs,
    * engines, AND future corpus growth: a doc's split never changes
    * when neighbours are added or removed, which is what makes the
    * eval set trustworthy over the life of the corpus. Disjoint and
    * exhaustive by construction (one CASE over one hash — there is no
    * row two splits can both claim). The salt decorrelates the split
    * from every other hash-keyed decision (ds1 sampling, ds3 shuffle).
    * Scan-side tag, one partial-agg'd shuffle for the per-(lang,split)
    * report; all-long outputs, no float parity risk. */
  /** The ONE split-assignment rule (salted hash → 80/10/10) — shared
    * by ds7 and the ds10 funnel's split stage so a share retune
    * retunes both. */
  def splitOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bucket =
      DedupQueries.hash60(concat(lit("split|"), id.cast("string"))) % 100
    when(bucket < 80, "train").when(bucket < 90, "validation")
      .otherwise("test")
  }

  def ds7Split(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .withColumn("split", splitOf($"doc_id"))
      .groupBy($"lang", $"split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars".cast("long")).as("n_chars"),
        min($"doc_id").as("first_doc"))
  }

  val ds7Sql: String = {
    val bucket =
      s"${DedupQueries.sqlHash60("'split|' || CAST(doc_id AS VARCHAR)")} % 100"
    s"""SELECT lang,
       |  CASE WHEN $bucket < 80 THEN 'train'
       |       WHEN $bucket < 90 THEN 'validation'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  min(doc_id) AS first_doc
       |FROM documents
       |GROUP BY 1, 2""".stripMargin
  }

  /** DS8: curriculum staging — order the corpus easy→hard and cut it
    * into four stages, the curriculum-learning prep step (feed short-
    * token "easy" text first, morphology-heavy text last). Difficulty
    * proxy = mean token length (the t_quality_clf feature, same exact
    * arithmetic); stage boundaries are the difficulty QUARTILES, and
    * stage assignment is a scan-side threshold comparison — NOT a
    * global ntile, which would plan as a single-partition window: the
    * thresholds ride a 1-row broadcast, so the only shuffle is the
    * 4-group report. At 100 TB the exact `percentile` threshold
    * aggregate (which buffers values) swaps for `approx_percentile`
    * unchanged in shape; this exact form is the oracle-checked audit
    * of that swap (the a8/a8'' discipline). Quartile boundary docs go
    * to the LOWER stage on ties (strict `>` thresholds), identically
    * in both engines. */
  def ds8Curriculum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = Tables(spark, dir, "documents")
      .withColumn("n_tok", size(split($"text", " ")).cast("long"))
      .withColumn("diff",
        ($"n_chars" - ($"n_tok" - 1)).cast("double") / $"n_tok")
    val cuts = f.agg(
      expr("percentile(diff, 0.25)").as("t1"),
      expr("percentile(diff, 0.5)").as("t2"),
      expr("percentile(diff, 0.75)").as("t3"))
    f.crossJoin(broadcast(cuts))
      .withColumn("stage",
        lit(1) + ($"diff" > $"t1").cast("int") +
          ($"diff" > $"t2").cast("int") + ($"diff" > $"t3").cast("int"))
      .groupBy($"stage")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        min($"diff").as("min_diff"),
        max($"diff").as("max_diff"))
  }

  val ds8Sql: String =
    """WITH f AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
      |    CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE) /
      |      len(string_split(text, ' ')) AS diff
      |  FROM documents),
      |cuts AS (
      |  SELECT quantile_cont(diff, 0.25) AS t1,
      |    quantile_cont(diff, 0.5) AS t2,
      |    quantile_cont(diff, 0.75) AS t3
      |  FROM f)
      |SELECT 1 + CAST(diff > t1 AS INT) + CAST(diff > t2 AS INT) +
      |    CAST(diff > t3 AS INT) AS stage,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(diff) AS min_diff, max(diff) AS max_diff
      |FROM f CROSS JOIN cuts
      |GROUP BY 1""".stripMargin

  /** Docs drawn per stratum by [[ds9StratifiedExact]]. */
  private val StratumN = 20

  /** DS9: exact-count stratified sampling — exactly [[StratumN]] docs
    * per language, the balanced-eval-set draw where ds1's hash-rate
    * sampling gives only EXPECTED counts (a 1%-rate sample of a rare
    * stratum can land 0 docs; an eval set needs exactly n). Selection
    * order is a salted hash (salt "strat|", decorrelated from the
    * ds1/ds3/ds7 hash decisions), so the draw is deterministic,
    * reproducible, and independent of storage order; ties cannot occur
    * (the hash is injective on distinct doc ids up to 60-bit
    * collisions, and doc_id breaks even those). The per-stratum
    * running top-k plans as a WindowGroupLimit (map-side partial — the
    * hn1 pin), never a global sort; all-integer output, zero float
    * surface. */
  /** The ONE exact-draw implementation — shared by the registry query
    * and [[graft.api.TrainingSet.exactStratifiedSample]] (the facade
    * discipline: one body, so a future change cannot silently diverge
    * the facade from its oracle-verified twin). Appends a 1-based
    * `rank` within the stratum and keeps rows with rank ≤ n. */
  private[graft] def exactStratifiedFrom(docs: DataFrame, idCol: String,
      stratumCol: String, n: Int, salt: String = "strat"): DataFrame = {
    val key = DedupQueries.hash60(
      concat(lit(salt + "|"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    docs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  def ds9StratifiedExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    exactStratifiedFrom(Tables(spark, dir, "documents"),
      "doc_id", "lang", StratumN)
      .select($"lang", $"rank".cast("long").as("rank"), $"doc_id",
        $"n_chars")
  }

  val ds9Sql: String = {
    val key = DedupQueries.sqlHash60("'strat|' || CAST(doc_id AS VARCHAR)")
    s"""SELECT lang, rank, doc_id, n_chars FROM (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY $key, doc_id) AS rank
       |  FROM documents)
       |WHERE rank <= $StratumN""".stripMargin
  }

  /** DS10: the curation funnel — the per-stage burn-down table every
    * training run logs, composed from the registry's own stage
    * semantics so the funnel IS the pipeline (not a re-implementation
    * of it): ingested (non-benchmark corpus) → quality survivors
    * (t_quality's keep rule) → dedup survivors (d1's canonical-min-id
    * over md5(text), evaluated among quality survivors — each stage
    * filters the previous stage's population) → decontaminated (no
    * d6 benchmark 5-gram overlap) → final ds7 train/validation/test
    * shares of the clean set. One row per stage: docs and whitespace
    * tokens surviving.
    *
    * Scale shape: one corpus scan carries all the scan-side flags
    * (quality, split); the dedup window shuffles by md5(text) — the
    * d1 shuffle; contamination is the d6 broadcast-semi probe; the
    * stage explosion is ≤7 tags per row feeding one partial-agg'd
    * groupBy. No stage re-scans the corpus. */
  /** The ds10 core over any (doc_id, text) corpus + benchmark pair —
    * the `api.TrainingSet.curationFunnel` entry point. */
  def curationFunnelFrom(train: DataFrame, bench: DataFrame): DataFrame = {
    import train.sparkSession.implicits._
    val contaminated = gramHashes(train, decontamN)
      .join(broadcast(
        gramHashes(bench, decontamN).select($"h").distinct()),
        Seq("h"), "leftsemi")
      .select($"doc_id").distinct()
      .withColumn("contam", lit(true))
    val flagged = train
      .withColumn("toks", split($"text", " "))
      .withColumn("n_tokens", size($"toks").cast("long"))
      // THE registry rules, not copies: TextQueries.keepRule is
      // t_quality's keep column; splitOf is ds7's assignment
      .withColumn("q", TextQueries.keepRule($"toks"))
      .withColumn("min_q_doc",
        min(when($"q", $"doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
      .withColumn("canon", $"q" && $"doc_id" === $"min_q_doc")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("clean", $"canon" && !coalesce($"contam", lit(false)))
      .withColumn("split", splitOf($"doc_id"))
    flagged
      .select($"n_tokens", explode(filter(array(
        lit("1_ingested"),
        when($"q", "2_quality"),
        when($"canon", "3_dedup"),
        when($"clean", "4_decontam"),
        when($"clean", concat(lit("5_"), $"split"))), t => t.isNotNull))
        .as("stage"))
      .groupBy($"stage")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
  }

  def ds10CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
    curationFunnelFrom(
      docs.filter($"source" =!= "src0"),
      docs.filter($"source" === "src0"))
  }

  val ds10Sql: String = {
    val n = decontamN
    val gramExpr =
      s"unnest(list_transform(range(len(t) - ${n - 1}), i -> " +
        s"concat_ws(' ', ${(1 to n).map(j => s"t[i+$j]").mkString(", ")})))"
    val bucket =
      s"${DedupQueries.sqlHash60("'split|' || CAST(d.doc_id AS VARCHAR)")} % 100"
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
       |  WHERE len(string_split(text, ' ')) >= $n),
       |grams AS (
       |  SELECT doc_id, source, ${DedupQueries.sqlHash60("gram")} AS h FROM (
       |    SELECT doc_id, source, $gramExpr AS gram FROM toks)),
       |bench AS (SELECT DISTINCT h FROM grams WHERE source = 'src0'),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM grams
       |  WHERE source <> 'src0' AND h IN (SELECT h FROM bench)),
       |flagged AS (
       |  SELECT
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |    q,
       |    q AND d.doc_id = min(CASE WHEN q THEN d.doc_id END)
       |      OVER (PARTITION BY md5(d.text)) AS canon,
       |    c.doc_id IS NOT NULL AS contam,
       |    CASE WHEN $bucket < 80 THEN 'train'
       |         WHEN $bucket < 90 THEN 'validation'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT *,
       |      len(string_split(text, ' ')) BETWEEN 20 AND 1000 AND
       |      len(list_filter(string_split(text, ' '),
       |        x -> x IN ('the', 'a'))) > 0 AS q
       |    FROM documents WHERE source <> 'src0') d
       |  LEFT JOIN contaminated c ON d.doc_id = c.doc_id),
       |staged AS (
       |  SELECT n_tokens, unnest(list_filter([
       |    '1_ingested',
       |    CASE WHEN q THEN '2_quality' END,
       |    CASE WHEN canon THEN '3_dedup' END,
       |    CASE WHEN canon AND NOT contam THEN '4_decontam' END,
       |    CASE WHEN canon AND NOT contam THEN '5_' || split END],
       |    x -> x IS NOT NULL)) AS stage
       |  FROM flagged)
       |SELECT stage, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM staged GROUP BY stage""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "ds10_curation_funnel" -> QueryDef.of(ds10Sql)(ds10CurationFunnel),
    "ds1_hash_sample" -> QueryDef.of(ds1Sql)(ds1HashSample),
    "ds8_curriculum" -> QueryDef.of(ds8Sql)(ds8Curriculum),
    "ds9_stratified_exact" -> QueryDef.of(ds9Sql)(ds9StratifiedExact),
    "ds7_split" -> QueryDef.of(ds7Sql)(ds7Split),
    "ds2_mixture" -> QueryDef.of(ds2Sql)(ds2Mixture),
    "ds3_shuffle" -> QueryDef.of(ds3Sql)(ds3Shuffle),
    "d6_decontaminate" -> QueryDef.of(d6Sql)(d6Decontaminate),
    "t_repetition" -> QueryDef.of(tRepetitionSql)(tRepetition),
    "t_redact" -> QueryDef.of(tRedactSql)(tRedact),
    "t_pii_report" -> QueryDef.of(tPiiReportSql)(tPiiReport),
    "ds4_token_budget" -> QueryDef.of(ds4Sql)(ds4TokenBudget),
    "ds5_dsir" -> QueryDef.of(ds5Sql)(ds5Dsir),
    "ds6_temperature" -> QueryDef.of(ds6Sql)(ds6Temperature),
    "t_blocklist" -> QueryDef.of(tBlocklistSql)(tBlocklist)
  )
}
