package graft.store

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental vocabulary state: sum-merge batch invariance, the
  * CORRECTNESS-bearing replay fence (sum double-counts where min
  * wouldn't), store-served tokenizer queries, and streaming
  * maintenance. */
class VocabStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private lazy val docs = Tables(spark, sf(), "documents")

  private def freshDir(tag: String) =
    graft.TempDirs.scratch(s"graft-vocab-$tag").toString

  test("counts are invariant under batch boundaries (2, 3, 5 batches)") {
    val oneShot = rows(VocabStore.partial(docs))
    for (n <- Seq(2, 3, 5)) {
      val parts = (0 until n).map(i =>
        VocabStore.partial(docs.filter(pmod(xxhash64($"doc_id"), lit(n)) === i)))
      assert(rows(VocabStore.merge(parts: _*)) == oneShot, s"$n batches")
    }
  }

  test("persisted lifecycle: served pair ranking and merges == batchless") {
    val dir = freshDir("life")
    val mid = docs.agg((max($"doc_id") / lit(2)).cast("long"))
      .collect()(0).getLong(0)
    VocabStore.initialize(docs.filter($"doc_id" <= mid), dir)
    VocabStore.refresh(spark, docs.filter($"doc_id" > mid), dir, 1L)
    assert(rows(VocabStore.pairCounts(spark, dir)) ==
      rows(graft.analytics.TokenizerQueries.bpe1From(docs)))
    assert(VocabStore.train(spark, dir, 4) ==
      graft.analytics.TokenizerQueries.bpeTrain(docs, 4))
    VocabStore.compact(dir, grace = 0)
    assert(rows(VocabStore.pairCounts(spark, dir)) ==
      rows(graft.analytics.TokenizerQueries.bpe1From(docs)))
  }

  test("replay fence is load-bearing: a re-delivered batch must NOT double-count") {
    val dir = freshDir("fence")
    val half = docs.filter($"doc_id" % 2 === 0)
    VocabStore.maintainBatch(half, dir, 0L)
    val before = rows(VocabStore.wordFreq(spark, dir))
    // same batch id re-delivered: skipped outright
    VocabStore.maintainBatch(half, dir, 0L)
    assert(rows(VocabStore.wordFreq(spark, dir)) == before)
    // an empty later batch advances only the fence
    VocabStore.maintainBatch(half.limit(0), dir, 1L)
    assert(VersionedState.lastBatchId(dir) == 1L)
    assert(rows(VocabStore.wordFreq(spark, dir)) == before)
  }

  test("drift between versions == training on each version's counts") {
    val dir = freshDir("drift")
    val mid = docs.agg((max($"doc_id") / lit(2)).cast("long"))
      .collect()(0).getLong(0)
    VocabStore.initialize(docs.filter($"doc_id" <= mid), dir)
    // fresh store: no predecessor → empty drift
    assert(VocabStore.drift(spark, dir, 4).isEmpty)
    VocabStore.refresh(spark, docs.filter($"doc_id" > mid), dir, 1L)
    val d = VocabStore.drift(spark, dir, 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSeq
    val cur = graft.analytics.TokenizerQueries
      .bpeTrainOnWordFreq(VocabStore.wordFreq(spark, dir), 4)
    val prev = graft.analytics.TokenizerQueries
      .bpeTrainOnWordFreq(VocabStore.partial(docs.filter($"doc_id" <= mid)), 4)
    val exp = (1 to 4).map { r =>
      val c = cur.find(_.rank == r).map(_.merged)
      val p = prev.find(_.rank == r).map(_.merged)
      (r, c.orNull, p.orNull, c.isDefined && c == p)
    }.filter(t => t._2 != null || t._3 != null)
    assert(d === exp)
    // compaction with grace 0 drops the predecessor → empty again
    VocabStore.compact(dir, grace = 0)
    assert(VocabStore.drift(spark, dir, 4).isEmpty)
  }

  test("drift absorbs a compaction won race: vanished version → empty, not 500") {
    val dir = freshDir("race")
    val mid = docs.agg((max($"doc_id") / lit(2)).cast("long"))
      .collect()(0).getLong(0)
    VocabStore.initialize(docs.filter($"doc_id" <= mid), dir)
    VocabStore.refresh(spark, docs.filter($"doc_id" > mid), dir, 1L)
    // simulate compaction landing AFTER drift's versionExists check:
    // the v=1 directory survives but its parquet files are gone — the
    // lazy read fails at job time and must resolve to the
    // absent-predecessor contract (empty frame), not an exception
    val v1 = new java.io.File(VersionedState.versionDir(dir, 1))
    v1.listFiles().foreach(f => assert(f.delete(), f))
    assert(VersionedState.versionExists(dir, 1))
    assert(VocabStore.drift(spark, dir, 4).isEmpty)
  }

  test("vs1 on an empty documents table is the empty ranking, not an NPE") {
    val empty = docs.filter(lit(false))
    val tmp = freshDir("empty")
    empty.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = VocabStore.vs1VocabStore(spark, tmp)
    assert(out.isEmpty)
    assert(out.columns.toSeq ==
      graft.analytics.TokenizerQueries.bpe1From(docs).columns.toSeq)
  }

  test("maintenance survives a query RESTART from its checkpoint: " +
    "recovered offsets + the batch fence give exactly-once across runs") {
    // file source (replayable across restarts, unlike MemoryStream):
    // run 1 folds part A, the query STOPS, part B arrives, run 2
    // resumes from the checkpoint — the recovered batch must fold B
    // exactly once and any replayed A-batch must hit the fence
    import org.apache.spark.sql.types._
    val in = freshDir("restart-in")
    val state = freshDir("restart-state")
    val ckpt = freshDir("restart-ckpt")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val all = docs.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (a, b) = all.splitAt(all.length / 2)
    def writeFiles(part: Seq[(Long, String)], tag: String): Unit = {
      import spark.implicits._
      part.toSeq.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").json(s"$in")
      val _ = tag
    }
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in)
      val q = VocabStore.maintain(stream, state)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeFiles(a.toSeq, "a")
    runOnce()
    val afterA = rows(VocabStore.wordFreq(spark, state))
    assert(afterA == rows(VocabStore.partial(
      docs.filter(col("doc_id").isin(a.map(_._1): _*)))))
    writeFiles(b.toSeq, "b")
    runOnce()
    assert(rows(VocabStore.wordFreq(spark, state)) ==
      rows(VocabStore.partial(docs)),
      "restart must fold exactly the unseen delta")
    // a third restart with NO new data must change nothing (sum-state:
    // any replay that slipped the fence would double-count)
    val settled = rows(VocabStore.wordFreq(spark, state))
    runOnce()
    assert(rows(VocabStore.wordFreq(spark, state)) == settled)
  }

  test("stream-maintained vocabulary equals the one-shot word counts") {
    val dir = freshDir("stream")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = VocabStore.maintain(
      mem.toDS().toDF("doc_id", "text"), dir)
      .option("checkpointLocation", freshDir("ckpt")).start()
    try {
      val all = docs.select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (a, b) = all.splitAt(all.length / 2)
      mem.addData(a.toSeq: _*); q.processAllAvailable()
      mem.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(rows(VocabStore.wordFreq(spark, dir)) ==
      rows(VocabStore.partial(docs)))
  }
}
