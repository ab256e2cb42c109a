package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-vocab scale proof for the delta-recount BPE trainer (the r12
  * verdict's #2 ask). The synthetic sf corpora hold only 31 distinct
  * words at EVERY scale factor (measured via the oracle engine — the
  * generator draws text from a fixed 31-word pool), so "k ≈ 30,000
  * merges over sf0.1 documents" is unreachable on the raw table: the
  * trainer exhausts all pairs after a few hundred merges. This spec
  * therefore derives a real-vocab word-frequency table FROM the sf0.1
  * corpus — all 31³ = 29,791 ordered word triples of its base words,
  * which is exactly the shape that matters for the trainer (tens of
  * thousands of distinct words with heavy shared subword structure and
  * skewed counts) — and proves the three load-bearing claims:
  *
  *   1. k = 30,000 merges actually train through the public gate
  *      ([[TokenizerQueries.bpeTrainOnWordFreq]] with the raised
  *      `spark.graft.bpe.localVocabLimit`), i.e. "real-vocab feasible"
  *      is a measured fact, not an asymptotic argument;
  *   2. the learned merge prefix is byte-identical to the DISTRIBUTED
  *      loop (forced via a lowered gate on the same table) — rank,
  *      pair, merged symbol AND count, including the (count desc,
  *      UTF-8 asc) tie-break;
  *   3. wall time is linear in touched occurrences: total ns divided
  *      by Σ merged-pair counts stays under a bound ~4× the measured
  *      rate, which a k·|vocab| full-recount trainer (30,000 × 29,791
  *      word scans ≈ 9·10⁸ versus the 1.59·10⁶-occurrence delta
  *      total) misses by two orders of magnitude.
  *
  * SCALE.md carries the measured row this spec re-asserts. */
class BpeRealVocabSpec extends SparkSpec {

  test("delta trainer at real-vocab k=30,000: trains through the gate, " +
    "distributed-loop prefix parity, wall time linear in touched occurrences") {
    val corpus = s"${sf("sf0.1")}/documents.parquet"
    assume(new java.io.File(corpus).exists(), "sf0.1 testdata not present")
    import spark.implicits._
    val base = spark.read.parquet(corpus)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter($"word" =!= "").distinct()
      .orderBy($"word").as[String].collect()
    assert(base.length == 31,
      s"corpus word pool drifted: expected 31, got ${base.length}")
    // 29,791 distinct words, Zipf-ish deterministic counts
    val words = for {
      (a, i) <- base.zipWithIndex
      (b, j) <- base.zipWithIndex
      c <- base
    } yield (s"$a$b$c", 1L + ((i * 31 + j) % 7))
    assert(words.map(_._1).distinct.length == 29791)
    val wf = spark.createDataFrame(words.toIndexedSeq).toDF("word", "cnt")

    val limitKey = "spark.graft.bpe.localVocabLimit"
    try {
      // 1. real-vocab k through the raised gate (29,791 < 131,072 routes
      //    to trainLocalDelta via ONE bounded collect)
      spark.conf.set(limitKey, "131072")
      val t0 = System.nanoTime()
      val local = TokenizerQueries.bpeTrainOnWordFreq(wf, 30000)
      val wallNs = System.nanoTime() - t0
      assert(local.length == 30000,
        s"expected the full 30,000 merges, trainer stopped at ${local.length}")

      // 3. linearity in touched occurrences: per-merge cost is the
      //    merged pair's (weighted) occurrence count; a full-recount
      //    trainer pays k·|vocab| instead and blows this bound
      val touched = local.map(_.pair_count).sum
      val nsPerOcc = wallNs.toDouble / touched
      info(f"k=30000 over 29,791 words: ${wallNs / 1e9}%.2f s, " +
        f"touched=$touched%d, $nsPerOcc%.0f ns/occurrence")
      // measured 2026-08-15: 25.6 s wall, 1,587,941 touched, ~16 µs per
      // weighted occurrence on a contended local[4] boot. The bound is
      // ~4× that; a k·|vocab| full recount implies ~560 word-visits per
      // occurrence here (30,000 × 29,791 / 1.59M) — milliseconds per
      // occurrence, two orders of magnitude over the bound.
      assert(nsPerOcc < 60000.0,
        f"delta trainer no longer linear in touched occurrences: " +
          f"$nsPerOcc%.0f ns/occ over $touched occurrences " +
          f"(${wallNs / 1e9}%.1f s wall)")

      // 2. prefix parity vs the DISTRIBUTED loop on the same table:
      //    a lowered gate forces the per-merge global argmax path
      spark.conf.set(limitKey, "1")
      val distributed = TokenizerQueries.bpeTrainOnWordFreq(wf, 24)
      assert(distributed.length == 24)
      assert(local.take(24) == distributed,
        s"prefix diverged:\n local=${local.take(24).mkString("\n ")}\n " +
          s"dist=${distributed.mkString("\n ")}")
    } finally spark.conf.unset(limitKey)
  }
}
