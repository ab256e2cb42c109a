package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered by the analytics modules; each pairs a
  * DataFrame builder with a DuckDB-oracle SQL twin (when expressible).
  */
object SparkEntry {

  /** All registered engine queries, in registration order. */
  val registry: Seq[(String, QueryDef)] =
    analytics.CoreQueries.defs ++
      analytics.JoinQueries.defs ++
      analytics.JoinQueries2.defs ++
      analytics.WindowQueries.defs ++
      analytics.ScanQueries.defs ++
      analytics.SourceQueries.defs ++
      analytics.BehavioralQueries.defs ++
      analytics.MapperQueries.defs ++
      analytics.DedupQueries.defs ++
      analytics.TextQueries.defs ++
      analytics.TrainingSetQueries.defs ++
      analytics.CorpusQueries.defs ++
      analytics.SimilarityQueries.defs ++
      analytics.MultimodalQueries.defs ++
      analytics.PathQueries.defs ++
      analytics.RetrievalQueries.defs ++
      analytics.ProjectionQueries.defs ++
      analytics.TokenizerQueries.defs ++
      analytics.SequenceQueries.defs ++
      analytics.LayoutQueries.defs ++
      store.MaterializedView.defs ++
      store.DedupIndex.defs ++
      store.SubstringIndex.defs ++
      store.AnnIndex.defs ++
      store.InvertedIndex.defs ++
      store.VocabStore.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.CoreQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.build }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }.toMap
}
