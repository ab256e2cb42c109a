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

  test("epochShuffle key matches ds3's ordering") {
    val keyed = TrainingSet.epochShuffle(docs, "doc_id", "epoch0")
      .orderBy(col("pos_key"), col("doc_id")).limit(100)
      .select(col("doc_id"), col("pos_key"))
    val reg = TrainingSetQueries.ds3Shuffle(spark, sf())
      .select(col("doc_id"), col("pos_key"))
    assert(rows(keyed) == rows(reg))
  }
}
