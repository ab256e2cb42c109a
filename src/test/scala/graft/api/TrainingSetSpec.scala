package graft.api

import graft.{SparkSpec, Tables}
import graft.analytics.{DedupQueries, TrainingSetQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facade instantiations must coincide with their oracle-verified
  * registry twins on the test corpus. */
class TrainingSetSpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val docs = Tables(spark, sf(), "documents")

  test("exactDedup == oracle-proven d1") {
    assert(rows(TrainingSet.exactDedup(docs)) ==
      rows(DedupQueries.d1Exact(spark, sf())))
  }

  test("dedupClusters == oracle-proven d5") {
    assert(rows(TrainingSet.dedupClusters(docs)) ==
      rows(DedupQueries.d5Clusters(spark, sf())))
  }

  test("dupSpanCoverage == oracle-proven d11") {
    assert(rows(TrainingSet.dupSpanCoverage(docs)) ==
      rows(DedupQueries.d11DupSpans(spark, sf())))
  }

  test("cdcChunkDedup == oracle-proven d12") {
    assert(rows(TrainingSet.cdcChunkDedup(docs)) ==
      rows(DedupQueries.d12CdcChunks(spark, sf())))
  }

  test("stripBoilerplate == oracle-proven d13") {
    assert(rows(TrainingSet.stripBoilerplate(docs)) ==
      rows(DedupQueries.d13StripBoilerplate(spark, sf())))
  }

  test("decontaminate(src0 as benchmark) reproduces d6's accounting") {
    val flagged = TrainingSet.decontaminate(
      docs.filter(col("source") =!= "src0"),
      benchmark = docs.filter(col("source") === "src0"))
    val api = flagged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("contaminated").cast("long")).as("n_contaminated"),
        (count(lit(1)) - sum(col("contaminated").cast("long"))).as("n_clean"))
    assert(rows(api) == rows(TrainingSetQueries.d6Decontaminate(spark, sf())))
  }

  test("sample(lang rates) == oracle-proven ds1 counts") {
    val sampled = TrainingSet.sample(docs, "doc_id", "lang",
      Map("en" -> 60, "es" -> 35, "de" -> 35, "fr" -> 20, "zh" -> 10))
    val api = sampled.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
    val reg = TrainingSetQueries.ds1HashSample(spark, sf())
      .select(col("lang"), col("n_sampled"))
    assert(rows(api) == rows(reg))
  }

  test("exactStratifiedSample == oracle-proven ds9; exactly n per stratum") {
    val api = TrainingSet.exactStratifiedSample(docs, "doc_id", "lang", 20)
      .select(col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_chars"))
    val reg = TrainingSetQueries.ds9StratifiedExact(spark, sf())
    assert(rows(api) == rows(reg))
    val counts = api.groupBy(col("lang")).count()
      .collect().map(_.getLong(1)).toSet
    assert(counts == Set(20L), "every stratum must yield exactly n rows")
  }

  test("epochShuffle key matches ds3's ordering") {
    val keyed = TrainingSet.epochShuffle(docs, "doc_id", "epoch0")
      .orderBy(col("pos_key"), col("doc_id")).limit(100)
      .select(col("doc_id"), col("pos_key"))
    val reg = TrainingSetQueries.ds3Shuffle(spark, sf())
      .select(col("doc_id"), col("pos_key"))
    assert(rows(keyed) == rows(reg))
  }

  test("paragraphDupStats == oracle-proven d8") {
    assert(rows(TrainingSet.paragraphDupStats(docs)) ==
      rows(graft.analytics.CorpusQueries.d8ParagraphDedup(spark, sf())))
  }

  test("dedupSurvivors keeps one best doc per cluster plus all singletons") {
    val survivors = TrainingSet.dedupSurvivors(docs, qualityCol = "n_chars")
    val clusters = TrainingSet.dedupClusters(docs)
    // exactly one survivor per cluster…
    val perCluster = survivors
      .join(clusters, "doc_id")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n")).collect()
    assert(perCluster.nonEmpty && perCluster.forall(_.getAs[Long]("n") == 1L))
    // …and it matches the registry's d9 choice (same rank: length, id)
    val d9 = graft.analytics.CorpusQueries.d9Survivors(spark, sf())
      .select(col("survivor_id")).collect().map(_.getLong(0)).toSet
    val clusteredSurvivors = survivors.join(clusters, "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(clusteredSurvivors == d9)
    // singletons all pass through
    val nSingletons = docs.count() - clusters.count()
    assert(survivors.count() == nSingletons + perCluster.length)
  }

  test("packingPlan agrees with pk1's per-bucket geometry") {
    import org.apache.spark.sql.functions.{size => asize}
    val planned = TrainingSet.packingPlan(
      docs.withColumn("n_tok", asize(split(col("text"), " ")).cast("long")),
      tokenCol = "n_tok", seqLen = 512, buckets = 8)
    val agg = planned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        (max(col("last_seq")) + 1L).as("n_seqs"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddlers"))
    val reg = graft.analytics.CorpusQueries.pk1Packing(spark, sf())
      .select(col("bucket"), col("n_docs"), col("n_tokens"), col("n_seqs"),
        col("n_straddlers"))
    assert(rows(agg) == rows(reg))
  }

  test("classifierScore reproduces t_quality_clf with the same features") {
    val feats = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", asLong(org.apache.spark.sql.functions.size(col("toks"))))
      .withColumn("stop_ratio",
        asLong(org.apache.spark.sql.functions.size(
          expr("filter(toks, t -> t IN ('the', 'a'))"))).cast("double") / col("n_tokens"))
      .withColumn("mean_tok_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("ln_tokens", log(col("n_tokens").cast("double")))
    val api = TrainingSet.classifierScore(feats, bias = -1.25,
      weights = Seq("stop_ratio" -> 4.0, "mean_tok_len" -> -0.35,
        "ln_tokens" -> 0.45))
      .select(col("doc_id"), col("score"), col("keep"))
    val reg = graft.analytics.CorpusQueries.tQualityClf(spark, sf())
    assert(rows(api) == rows(reg))
  }

  private def asLong(c: org.apache.spark.sql.Column) = c.cast("long")

  test("fuzzyDecontaminate(src0 as benchmark) reproduces d10's accounting") {
    val flagged = TrainingSet.fuzzyDecontaminate(
      docs.filter(col("source") =!= "src0"),
      benchmark = docs.filter(col("source") === "src0"))
    val api = flagged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("fuzzy_contaminated").cast("long")).as("n_fuzzy_contaminated"),
        (count(lit(1)) - sum(col("fuzzy_contaminated").cast("long"))).as("n_clean"))
    assert(rows(api) == rows(DedupQueries.d10FuzzyDecontam(spark, sf())))
  }

  test("fuzzy decontamination flags a paraphrase exact overlap misses") {
    import spark.implicits._
    // benchmark doc vs a corpus doc differing in its LAST word of 40:
    // the edit perturbs exactly one of 38 shingles, so the MinHash band
    // signature (2 of 8 minima per band) survives — while a fully
    // unrelated doc shares no band. This is the semantic gap between
    // d6-style exact overlap and d10.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val paraphrase = base.replace("tok40", "EDITED")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq((1L, paraphrase), (2L, unrelated)).toDF("doc_id", "text")
    val out = TrainingSet.fuzzyDecontaminate(corpus, bench)
      .select("doc_id", "fuzzy_contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L), "near-copy of a benchmark doc was not flagged")
    assert(!out(2L), "unrelated doc was falsely flagged")
  }

  test("tokenBudgetMix == oracle-proven ds4 accounting") {
    val mixed = TrainingSet.tokenBudgetMix(
      docs.withColumn("n_tokens",
        asLong(org.apache.spark.sql.functions.size(split(col("text"), " ")))),
      tokenCol = "n_tokens", stratumCol = "lang",
      budgets = Map("en" -> 5000L, "es" -> 5000L, "de" -> 5000L,
        "fr" -> 5000L, "zh" -> 5000L))
    val api = mixed.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        (max(col("cum_tokens")).cast("double") / 5000L).as("utilization"))
    assert(rows(api) == rows(TrainingSetQueries.ds4TokenBudget(spark, sf())))
  }

  test("tokenBudgetMix is a pure function of (corpus, salt, budget)") {
    val withTokens = docs.withColumn("n_tokens",
      asLong(org.apache.spark.sql.functions.size(split(col("text"), " "))))
    def pick(df: DataFrame) = TrainingSet
      .tokenBudgetMix(df, "n_tokens", "lang", Map("en" -> 3000L))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val once = pick(withTokens)
    assert(once.nonEmpty)
    // repartitioning must not change the selection (retry/speculation
    // safety — the order key is content, not placement)
    assert(pick(withTokens.repartition(13)) == once)
    // a different salt is a different (still deterministic) epoch
    val other = TrainingSet
      .tokenBudgetMix(withTokens, "n_tokens", "lang", Map("en" -> 3000L),
        salt = "mix1")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(other != once)
  }

  test("contextChunks == oracle-proven ch1") {
    assert(rows(TrainingSet.contextChunks(docs)) ==
      rows(graft.analytics.TokenizerQueries.ch1ContextChunks(spark, sf())))
  }

  test("curationFunnel == oracle-proven ds10 through renamed columns") {
    import org.apache.spark.sql.functions.col
    val train = docs.filter(col("source") =!= "src0")
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
    val bench = docs.filter(col("source") === "src0")
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body")
    assert(rows(TrainingSet.curationFunnel(train, bench,
      idCol = "id", textCol = "body")) ==
      rows(TrainingSetQueries.ds10CurationFunnel(spark, sf())))
  }

  test("bpeMerges == oracle-proven bpe2") {
    val viaFacade = TrainingSet.bpeMerges(docs, 4)
    val viaRegistry = graft.analytics.TokenizerQueries
      .bpeTrain(Tables(spark, sf(), "documents"), 4)
    assert(viaFacade == viaRegistry)
  }
}
