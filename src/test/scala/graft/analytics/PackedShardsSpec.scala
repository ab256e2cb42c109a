package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** pk3 materialization contracts: exact fill, losslessness of the
  * bucket token stream, and the partitioned writer round-trip. */
class PackedShardsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf(), "documents")

  test("every sequence except the last per bucket holds exactly SeqLen tokens") {
    val seqs = CorpusQueries.packedSeqsFrom(docs)
      .withColumn("max_seq",
        max($"seq_id").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"bucket")))
      .collect()
    assert(seqs.nonEmpty)
    seqs.foreach { r =>
      val (seqId, nTok, maxSeq) =
        (r.getLong(1), r.getLong(2), r.getLong(4))
      if (seqId < maxSeq) assert(nTok === 512L, s"seq $seqId underfilled")
      else assert(nTok >= 1L && nTok <= 512L)
    }
  }

  test("concatenating a bucket's sequences reproduces its doc stream exactly") {
    val seqSide = CorpusQueries.packedSeqsFrom(docs)
      .groupBy($"bucket")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(seq_id, seq_text))), s -> s.seq_text)"))
        .as("packed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docSide = docs
      .withColumn("bucket",
        DedupQueries.hash60($"doc_id".cast("string")) % 8)
      .groupBy($"bucket")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(doc_id, text))), s -> s.text)"))
        .as("stream"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(seqSide.keySet === docSide.keySet)
    seqSide.foreach { case (b, packed) =>
      assert(packed === docSide(b), s"bucket $b stream diverged")
    }
  }

  test("a doc longer than a whole sequence slices across several without loss") {
    // 1300 tokens: spans at least 3 sequences on its own, plus seeded
    // neighbours to shift its start offset inside the bucket stream
    val rnd = new scala.util.Random(11)
    val synth = (1L to 20L).map { i =>
      val n = if (i == 7L) 1300 else 1 + rnd.nextInt(60)
      (i, (1 to n).map(k => s"d${i}w$k").mkString(" "))
    }.toDF("doc_id", "text")
    val seqs = CorpusQueries.packedSeqsFrom(synth)
    // exact fill still holds
    val byBucket = seqs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    byBucket.foreach { case (b, rows) =>
      val maxSeq = rows.map(_._2).max
      rows.foreach { case (_, s, n, _) =>
        if (s < maxSeq) assert(n === 512L, s"bucket $b seq $s")
      }
      // losslessness of the long doc: its tokens appear contiguously
      // in seq order
      val stream = rows.sortBy(_._2).map(_._4).mkString(" ")
      val firstTok = stream.split(" ").indexWhere(_.startsWith("d7w"))
      if (firstTok >= 0) {
        val toks = stream.split(" ").filter(_.startsWith("d7w"))
        assert(toks.toSeq === (1 to toks.length).map(k => s"d7w$k"),
          "long doc's token order broke across sequence boundaries")
      }
    }
  }

  test("the shard writer round-trips through the partitioned layout") {
    val dir = graft.TempDirs.scratch("pk3-shards").toString
    val n = CorpusQueries.packedShards(docs, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === n)
    // partition pruning by bucket actually prunes (one shard dir read)
    val one = back.filter($"bucket" === 3)
    val scanned = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(scanned.contains("PartitionFilters: [isnotnull(bucket"), scanned)
    // content matches the oracle grain
    // the partition column comes back as the narrowest inferred type
    val viaStore = back
      .select($"bucket".cast("long"), $"seq_id",
        md5($"seq_text".cast("binary")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val direct = CorpusQueries.pk3From(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(viaStore === direct)
  }
}
