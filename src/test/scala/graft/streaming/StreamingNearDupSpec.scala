package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming LSH near-dup ≡ batch d2 on ordered replay, and the bucket
  * cap bounds both emissions and state exactly like the batch cap. */
class StreamingNearDupSpec extends SparkSpec {

  private lazy val spark0 = spark
  import spark0.implicits._

  test("ordered replay of the corpus emits exactly d2's candidate set") {
    val docs = Tables(spark, sf(), "documents")
      .select($"doc_id", $"text",
        // monotone event time in doc_id order — the commit-log replay
        timestamp_seconds(lit(1700000000L) + $"doc_id").as("ts"))
    val banded = StreamingNearDup.bandKeys(docs)
      .collect().sortBy(b => b.doc_id)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[BandedDoc]
    val q = StreamingNearDup.candidates(mem.toDS())
      .writeStream.format("memory").queryName("ndup_out")
      .outputMode("append").start()
    try {
      // two micro-batches, split mid-corpus
      val (first, second) = banded.splitAt(banded.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ndup_out").as[NearDupCandidate]
        .collect().map(c => (c.doc1, c.doc2)).toSet
      val batch = graft.analytics.DedupQueries.d2MinhashLsh(spark, sf())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("a full bucket admits nothing: emissions bounded by C(cap,2), " +
    "late clones are silent") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    def doc(id: Long): BandedDoc =
      BandedDoc(0, "samekey", id, new java.sql.Timestamp((t0 + id) * 1000))
    val mem = MemoryStream[BandedDoc]
    val q = StreamingNearDup.candidates(mem.toDS(), cap = 3)
      .writeStream.format("memory").queryName("ndup_cap")
      .outputMode("append").start()
    try {
      mem.addData((1L to 5L).map(doc): _*)
      q.processAllAvailable()
      val pairs = spark.table("ndup_cap").as[NearDupCandidate]
        .collect().map(c => (c.doc1, c.doc2)).toSet
      // only the first 3 admitted: exactly C(3,2) pairs, none involving 4/5
      assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // a duplicate sighting of an admitted doc re-emits nothing
      mem.addData(doc(2L))
      q.processAllAvailable()
      assert(spark.table("ndup_cap").count() == 3)
    } finally q.stop()
  }
}
