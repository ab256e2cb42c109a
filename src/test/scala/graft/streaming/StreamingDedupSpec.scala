package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup: first-occurrence-wins verdicts across
  * micro-batches, retention expiry freeing state, and parity with the
  * batch d1 formulation on a replayed corpus. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(1_700_000_000_000L + s * 1000)
  private def d(h: String, id: Long, s: Long) = StreamDoc(h, id, t(s))

  test("verdict stream: first copy kept, later copies point at the canonical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedup(mem.toDS(), retentionMs = 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(d("hA", 10, 0), d("hB", 11, 1))
      q.processAllAvailable()
      // a duplicate in a LATER batch must still resolve to the original
      mem.addData(d("hA", 12, 2), d("hC", 13, 3), d("hA", 14, 4))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[DedupVerdict].collect()
        .sortBy(_.doc_id)
      assert(rows.map(v => (v.doc_id, v.kept, v.canonical_id)).toSeq == Seq(
        (10L, true, 10L), (11L, true, 11L),
        (12L, false, 10L), (13L, true, 13L), (14L, false, 10L)))
    } finally q.stop()
  }

  test("within one unordered micro-batch the earliest (ts, doc_id) wins") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedup(mem.toDS(), retentionMs = 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("dedup_order")
      .outputMode("append").start()
    try {
      // arrival order reversed from event time; same-ts tie broken by id
      mem.addData(d("hX", 99, 5), d("hX", 50, 1), d("hX", 60, 1))
      q.processAllAvailable()
      val rows = spark.table("dedup_order").as[DedupVerdict].collect()
        .sortBy(_.doc_id)
      assert(rows.filter(_.kept).map(_.doc_id).toSeq == Seq(50L))
      assert(rows.forall(_.canonical_id == 50L))
    } finally q.stop()
  }

  test("retention expiry frees the hash: a re-arrival becomes a fresh canonical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedup(mem.toDS(), retentionMs = 600 * 1000)
    val q = out.writeStream.format("memory").queryName("dedup_exp")
      .outputMode("append").start()
    try {
      mem.addData(d("hR", 1, 0))
      q.processAllAvailable()
      // push the watermark far past retention, then let the timeout pass run
      mem.addData(d("zz", 2, 5000))
      q.processAllAvailable()
      mem.addData(d("zz", 3, 5001))
      q.processAllAvailable()
      // hR's state expired → doc 4 is a NEW canonical, not a duplicate
      mem.addData(d("hR", 4, 5002))
      q.processAllAvailable()
      val hr = spark.table("dedup_exp").as[DedupVerdict].collect()
        .filter(_.content_hash == "hR").sortBy(_.doc_id)
      assert(hr.map(v => (v.doc_id, v.kept, v.canonical_id)).toSeq == Seq(
        (1L, true, 1L), (4L, true, 4L)))
    } finally q.stop()
  }

  test("dedup state survives a query restart from its checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val base = graft.TempDirs.scratch("graft-dedup-ckpt")
    val ckpt = s"$base/ckpt"
    val outDir = s"$base/out"
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedup(mem.toDS(), retentionMs = 3600 * 1000)
    // the memory sink cannot recover from a checkpoint; a file sink can
    def start() = out.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      mem.addData(d("hS", 1, 0), d("hT", 2, 1))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the same checkpoint: the canonical for hS must be
    // recovered from the state store, not re-derived — a duplicate
    // arriving post-restart resolves to the PRE-restart doc
    val q2 = start()
    try {
      mem.addData(d("hS", 9, 5), d("hU", 10, 6))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).as[DedupVerdict].collect()
        .sortBy(_.doc_id)
      assert(rows.map(v => (v.doc_id, v.kept, v.canonical_id)).toSeq ==
        Seq((1L, true, 1L), (2L, true, 2L), (9L, false, 1L), (10L, true, 10L)))
    } finally q2.stop()
  }

  test("replayed static corpus matches batch d1 (hash → min doc_id)") {
    implicit val sqlCtx = spark.sqlContext
    // a commit-log replay arrives in log order = doc_id order; with equal
    // timestamps first-seen-wins then equals d1's min(doc_id) canonical.
    // (An UNORDERED replay legitimately differs: streaming keeps the
    // first arrival — that is the operator's contract, not a bug.)
    val docs = graft.Tables(spark, sf(), "documents")
      .select(md5($"text").as("content_hash"), $"doc_id")
      .collect()
      .map(r => d(r.getString(0), r.getLong(1), r.getLong(1)))
      .toSeq.sortBy(_.doc_id)
    val mem = MemoryStream[StreamDoc]
    val out = StreamingDedup.dedup(mem.toDS(), retentionMs = 3600 * 1000)
    val q = out.writeStream.format("memory").queryName("dedup_replay")
      .outputMode("append").start()
    try {
      // replay in two arbitrary chunks — canonical choice must not care
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("dedup_replay").as[DedupVerdict]
        .filter(_.kept)
        .collect().map(v => v.content_hash -> v.canonical_id).toMap
      val batch = graft.analytics.DedupQueries
        .d1Exact(spark, sf()).collect()
        .map(r => r.getAs[String]("text_md5") -> r.getAs[Long]("canonical_id"))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
