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
  *   3. wall time is linear in touched occurrences, asserted RELATIVE
  *      to the retained textbook full-recount trainer timed in the
  *      same JVM (machine speed cancels): the delta run must beat the
  *      implied k·|vocab| full-recount cost by ≥3× — measured 13×
  *      (25.6 s vs ~320 s implied; the full recount pays 30,000 ×
  *      29,791 word scans versus the 1.59·10⁶-occurrence delta
  *      total).
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

      // 3. linearity in touched occurrences, asserted RELATIVE to the
      //    retained textbook full-recount trainer measured in the SAME
      //    JVM on the same table — machine speed and boot contention
      //    cancel out of the ratio (an absolute ns bound here would
      //    gate the suite on host speed, the anti-pattern the calib
      //    convention exists to avoid). The full recount pays
      //    k·|vocab| word scans, so its implied k=30,000 cost is
      //    (measured k=300 cost) × 100; the delta trainer must beat
      //    that by ≥3× (measured 2026-08-15: 25.6 s actual vs ~320 s
      //    implied — a 13× margin; a delta-index regression back to
      //    per-merge vocab scans lands AT the implied cost and fails).
      val touched = local.map(_.pair_count).sum
      val symsOf = () => words.map { case (w, c) =>
        (w.map(_.toString).toArray :+ "</w>", c)
      }.toArray
      val tRef0 = System.nanoTime()
      val ref = TokenizerQueries.trainLocal(symsOf(), 300)._1
      val refNs = System.nanoTime() - tRef0
      assert(ref.length == 300)
      val impliedFullNs = refNs.toDouble / 300 * 30000
      info(f"k=30000 over 29,791 words: ${wallNs / 1e9}%.2f s delta " +
        f"(touched=$touched%d, ${wallNs.toDouble / touched}%.0f ns/occ) vs " +
        f"${impliedFullNs / 1e9}%.1f s implied full recount")
      assert(wallNs < impliedFullNs / 3,
        f"delta trainer lost its linearity edge: ${wallNs / 1e9}%.1f s vs " +
          f"${impliedFullNs / 1e9}%.1f s implied full-recount cost " +
          f"(ratio ${impliedFullNs / wallNs}%.1f, need >= 3)")

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
