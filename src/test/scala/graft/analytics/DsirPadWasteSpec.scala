package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DS5 (DSIR importance resampling) + PK2 (padded-batch waste audit)
  * behavioral contracts, beyond the oracle's hash gate:
  *  - DSIR must RANK target-like raw docs above off-domain ones — the
  *    whole point of the operator — and its scores must be a pure
  *    function of the data (repartition-invariant), or selection is
  *    not reproducible across cluster layouts.
  *  - PK2's accounting must balance exactly: per length class,
  *    sum_tokens + pad_tokens == Σ_batches batch_max·batch_size, and a
  *    batch of identical lengths pads nothing.
  */
class DsirPadWasteSpec extends SparkSpec {

  test("dsir ranks target-like raw docs above off-domain raw docs") {
    import spark.implicits._
    // target LM trained on 'code'-flavored docs; raw pool has one
    // code-flavored doc and one prose doc of equal length
    val docs = Seq(
      (1L, "def foo return int def bar return int", "target"),
      (2L, "def baz return int def qux return int", "target"),
      (3L, "def quux return int def corge return int", "raw"),
      (4L, "the cat sat on the mat with a hat", "raw")
    ).toDF("doc_id", "text", "split")
    val scores = TrainingSetQueries
      .dsirScoresFrom(docs, $"split" === "target")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.keySet == Set(3L, 4L), "only raw docs are scored")
    assert(scores(3L) > scores(4L),
      s"code-flavored raw doc must outrank prose: $scores")
  }

  test("dsir scores are invariant under physical repartition") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocabulary = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docs = (0L until 60L).map { i =>
      val n = 3 + rng.nextInt(12)
      val text = Seq.fill(n)(vocabulary(rng.nextInt(vocabulary.size))).mkString(" ")
      (i, text, if (i % 5 == 0) "t" else "r")
    }.toDF("doc_id", "text", "split")
    def run(df: org.apache.spark.sql.DataFrame) = TrainingSetQueries
      .dsirScoresFrom(df, col("split") === "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run(docs)
    val b = run(docs.repartition(13))
    val c = run(docs.orderBy($"doc_id".desc).coalesce(1))
    assert(a == b && a == c, "dsir scores depend on physical layout")
  }

  test("pk2 accounting balances: padded volume == sum + pad, exactly") {
    val out = CorpusQueries.pk2PadWaste(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, nBatches) = (r.getLong(1), r.getLong(2))
      val (sum, pad) = (r.getLong(3), r.getLong(4))
      val frac = r.getDouble(5)
      assert(pad >= 0L, "negative padding is impossible")
      assert(nBatches == (nDocs + 15) / 16,
        s"batches must be ceil(docs/16): $r")
      assert(math.abs(frac - pad.toDouble / (sum + pad)) == 0.0,
        "pad_frac must be the single division of the exact longs")
    }
  }

  test("pk2: a batch of identical lengths pads nothing; mixed lengths pad to the batch max") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // force ONE length class (all lengths in (0,32]) with known tokens
    val docs = (0L until 32L)
      .map(i => (i, Seq.fill(if (i < 16) 10 else 10 + (i % 4).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    // mirror the operator's bucketing to compute the expected pad
    val sized = docs.select($"doc_id",
      size(split($"text", " ")).cast("long").as("n_tok"),
      DedupQueries.hash60(concat($"doc_id".cast("string"), lit("|pad0")))
        .as("pick_key"))
    val w = Window.partitionBy(lit(1)).orderBy($"pick_key", $"doc_id")
    val expected = sized
      .withColumn("rk", row_number().over(w))
      .withColumn("batch", expr("(rk - 1) DIV 16"))
      .groupBy($"batch")
      .agg((max($"n_tok") * count(lit(1)) - sum($"n_tok")).as("pad"))
      .agg(sum($"pad")).collect()(0).getLong(0)
    val tmp = graft.TempDirs.scratch("pk2spec").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = CorpusQueries.pk2PadWaste(spark, tmp).collect()
    assert(got.length == 1, s"one length class expected: ${got.toSeq}")
    assert(got(0).getLong(4) == expected,
      s"pad_tokens ${got(0).getLong(4)} != sequential expectation $expected")
  }
}
