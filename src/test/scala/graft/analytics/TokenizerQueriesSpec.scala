package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Tokenizer-training family: bpe1 pair mining, bpe2 distributed merge
  * learning (checked against an independent single-node textbook BPE
  * below — the correctness gate for the oracle-less registry entry),
  * ch1 context-window chunking. */
class TokenizerQueriesSpec extends SparkSpec {
  import TokenizerQueries._

  /** Independent reference: textbook BPE (Sennrich et al. 2016, alg. 1)
    * on a word-frequency map — recount all pairs, take the (count desc,
    * pair asc) argmax, merge left-to-right non-overlapping, repeat.
    * Written against Scala collections only; shares no code with the
    * Spark implementation. */
  private def referenceBpe(wordFreq: Map[String, Long], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordFreq.map { case (w, c) =>
      (w.toVector.map(_.toString) :+ "</w>") -> c
    }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, l + r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
        } { case (_, c) => c }(_ + _)
      }
    }
    out.result()
  }

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bpe1: pair counts weight by word frequency and append </w>") {
    val d = docsDf(Seq((1L, "aa aa ab"), (2L, "aa")))
    val rows = bpe1From(d)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // words: aa×3, ab×1 → pairs: (a,a)=3, (a,</w>)=3, (a,b)=1, (b,</w>)=1
    assert(rows === Seq(
      (1L, "a", "</w>", 3L),
      (2L, "a", "a", 3L),
      (3L, "a", "b", 1L),
      (4L, "b", "</w>", 1L)))
  }

  test("bpe1 == independent pair counting on 20 seeded corpora") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 20) {
      val words = Seq.fill(2 + rnd.nextInt(8)) {
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(3)).toChar).mkString
      }
      val d = docsDf(Seq((1L, words.mkString(" "))))
      // reference: weight every adjacent char pair (plus the </w>
      // tail) by word frequency, rank (count desc, pair asc)
      val wf = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val counts = collection.mutable.Map[(String, String), Long]()
      wf.foreach { case (w, c) =>
        val syms = w.toVector.map(_.toString) :+ "</w>"
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val exp = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .take(50).zipWithIndex
        .map { case (((l, r), c), i) => (i + 1L, l, r, c) }
      val got = bpe1From(d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got === exp, s"trial $trial: '${words.mkString(" ")}'")
    }
  }

  test("bpe1: single-char words produce only the </w> pair") {
    val d = docsDf(Seq((1L, "x x y")))
    val rows = bpe1From(d)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows.toSet === Set(("x", "</w>", 2L), ("y", "</w>", 1L)))
  }

  test("bpe2: merge fold is left-to-right non-overlapping (aaa → [aa, a])") {
    val d = docsDf(Seq((1L, "aaa")))
    val merges = bpeTrain(d, 2)
    // chars: a a a </w>. pairs: (a,a)=2, (a,</w>)=1 → merge1 = aa.
    // then: aa a </w> → pairs (aa,a)=1, (a,</w>)=1 → tie on count,
    // (a,</w>) < (aa,a) lexicographically → merge2 = a</w>.
    assert(merges.map(m => (m.rank, m.left, m.right, m.pair_count)) === Seq(
      (1, "a", "a", 2L),
      (2, "a", "</w>", 1L)))
  }

  test("bpe2 == independent textbook BPE on sf0.001 documents (k=8)") {
    val docs = graft.Tables(spark, sf(), "documents")
    import spark.implicits._
    val wf = docs
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(wf, 8)
    val got = bpeTrain(docs, 8)
      .map(m => (m.rank, m.left, m.right, m.merged, m.pair_count))
    assert(got === expected)
  }

  test("bpe3 on an exhausting corpus reports stats from the merges learned") {
    // 'ab ab' + 'ab': 2 merges exhaust the vocabulary; the stats must
    // come from the final real symbol table (the SQL twin's empty-stage
    // fallback pins the same on the DuckDB side)
    import spark.implicits._
    val d = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = bpeTrain(d, 8)
    assert(merges.size === 2)
    val tmp = graft.TempDirs.scratch("bpe3-exh")
    d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val row = bpe3SegmentStats(spark, tmp.toString).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3)) === ((3L, 9L, 3L, 3.0)))
  }

  test("bpe2 stops early when every word is fully merged") {
    val d = docsDf(Seq((1L, "ab ab")))
    // a b </w> → ab </w> → ab</w> → nothing left to pair
    val merges = bpeTrain(d, 10)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("a", "b"), ("ab", "</w>")))
  }

  test("bpe3: segmentation stats match the reference segmentation on sf0.001") {
    val docs = graft.Tables(spark, sf(), "documents")
    import spark.implicits._
    val wf = docs
      .select(explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .groupBy($"w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // reference: apply the textbook merges to every word, left-to-right
    // non-overlapping, in rank order
    val merges = referenceBpe(wf, 8).map { case (_, l, r, _, _) => (l, r) }
    def applyRef(word: String): Vector[String] =
      merges.foldLeft(word.toVector.map(_.toString) :+ "</w>") {
        case (syms, (l, r)) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result()
      }
    val expBpeTokens = wf.map { case (w, c) => applyRef(w).length * c }.sum
    val expCharTokens = wf.map { case (w, c) => (w.length + 1L) * c }.sum
    val row = TokenizerQueries.bpe3SegmentStats(spark, sf()).collect()(0)
    assert(row.getLong(0) === wf.values.sum)
    assert(row.getLong(1) === expCharTokens)
    assert(row.getLong(2) === expBpeTokens)
    assert(row.getDouble(3) === expCharTokens.toDouble / expBpeTokens)
  }

  test("bpe2 == textbook BPE on adversarial corpora (repeat-heavy fuzz)") {
    // back-to-back pair repeats ('aaaa'), cross-word ties, and
    // single-char words are where merge folds typically diverge from
    // the textbook greedy pass — 30 seeded random corpora over a tiny
    // alphabet maximize those collisions
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 30) {
      val words = Seq.fill(1 + rnd.nextInt(6)) {
        Seq.fill(1 + rnd.nextInt(5))(('a' + rnd.nextInt(2)).toChar).mkString
      }
      val text = words.mkString(" ")
      val d = docsDf(Seq((1L, text)))
      val wf = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val exp = referenceBpe(wf, 4)
      val got = bpeTrain(d, 4)
        .map(m => (m.rank, m.left, m.right, m.merged, m.pair_count))
      assert(got === exp, s"corpus: '$text'")
    }
  }

  test("delta-recount trainer == full-recount textbook loop (merges AND " +
    "final tables) on 60 randomized vocabularies") {
    // the real-vocab (~30k-merge) path: pair counts maintained
    // incrementally with a lazy-deletion heap argmax and a stale-
    // tolerant inverted index. Byte-identity with the full recount is
    // the whole contract — exercised where delta logic typically
    // breaks: back-to-back repeats (overlap consumption), count ties
    // (utf8 tie-break through the heap), words hit by many merges
    // (stale index entries), multi-char supplementary symbols
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 60) {
      val alpha = Seq("a", "b", "c", "😀", "é").take(2 + rnd.nextInt(3))
      val words = Array.fill(1 + rnd.nextInt(12)) {
        val syms = Array.fill(1 + rnd.nextInt(9))(alpha(rnd.nextInt(alpha.size)))
        (syms, 1L + rnd.nextInt(20))
      }
      val k = 1 + rnd.nextInt(12)
      // deep-copy: both trainers mutate their input arrays
      val (mFull, tFull) = TokenizerQueries.trainLocal(
        words.map { case (s, c) => (s.clone(), c) }, k)
      val (mDelta, tDelta) = TokenizerQueries.trainLocalDelta(
        words.map { case (s, c) => (s.clone(), c) }, k)
      assert(mDelta === mFull, s"round $round merges diverge")
      assert(tDelta.map(_.toSeq).toSeq === tFull.map(_.toSeq).toSeq,
        s"round $round final tables diverge")
    }
  }

  test("bpe4: identical halves agree at every rank; a skewed half diverges") {
    import spark.implicits._
    def drift(rows: Seq[(Long, String)]) = {
      val tmp = graft.TempDirs.scratch("bpe4")
      rows.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      TokenizerQueries.bpe4MergeDrift(spark, tmp.toString)
        .collect().map(r => r.getInt(0) -> r.getBoolean(3)).toMap
    }
    // docs 1..4 all identical → the half (ids ≤ 2) sees the same
    // distribution → full agreement
    val same = drift((1L to 4L).map(i => (i, "banana band bands")))
    assert(same.values.forall(identity), same)
    // the late docs (PAST the id midpoint, so only the full corpus
    // sees them) flood a different pair — the full corpus's top
    // merges must diverge from the half's
    val skewed = drift(
      (1L to 20L).map(i => (i, "banana band bands")) ++
        (21L to 40L).map(i => (i, "zzzz zzzz zzzz zzzz")))
    assert(skewed.values.exists(v => !v), skewed)
  }

  test("ch1: short doc is one partial chunk; long doc overlaps at stride 24") {
    val shortDoc = (1 to 10).map(i => s"t$i").mkString(" ")
    val longDoc = (1 to 60).map(i => s"u$i").mkString(" ")
    val d = docsDf(Seq((1L, shortDoc), (2L, longDoc)))
    val rows = ch1From(d)
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    // doc1: n=10 ≤ 32 → 1 chunk of 10.
    // doc2: n=60 → 1 + ceil(28/24) = 3 chunks: [0,32), [24,56), [48,60).
    assert(rows === Seq(
      (1L, 0L, 0L, 10L),
      (2L, 0L, 0L, 32L),
      (2L, 1L, 24L, 32L),
      (2L, 2L, 48L, 12L)))
  }

  test("ch1: a NULL text yields zero chunks, not a garbage row") {
    import spark.implicits._
    val d = Seq((1L, Some("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ids = TokenizerQueries.ch1From(d)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L))
  }

  test("ch1: chunk md5 is the content address of the joined token span") {
    val d = docsDf(Seq((1L, "a b c")))
    val got = ch1From(d).select("chunk_md5").collect()(0).getString(0)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === exp)
  }

  test("ch1 == independent reference chunker on 40 seeded random docs") {
    // reference: textbook window/stride chunking over the token list,
    // shared code with nothing in the Spark implementation
    def refChunks(text: String): Seq[(Long, Long, Long)] = {
      val n = text.split(" ", -1).length
      val nChunks = 1 + math.max(0, (n - 32 + 23) / 24)
      (0 until nChunks).map { i =>
        (i.toLong, (i * 24).toLong, math.min(32, n - i * 24).toLong)
      }
    }
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map { i =>
      // lengths straddling every boundary case: empty-ish, exactly W,
      // W±1, multiples of S, long tails
      val n = Seq(1, 31, 32, 33, 48, 56, 57, 80, 200)(rnd.nextInt(9))
      (i, (1 to n).map(k => s"t$k").mkString(" "))
    }
    val got = ch1From(docsDf(docs))
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === refChunks(text), s"doc $id (${text.length} chars)")
    }
  }

  test("ch1: no shuffle — plan is scan-side only") {
    val d = graft.Tables(spark, sf(), "documents")
    val plan = ch1From(d).queryExecution.executedPlan.toString
    assert(algoExchangeLines(plan).isEmpty, plan)
  }

  test("bpe2/bpe3: distributed loop == driver-local loop (vocab gate)") {
    // the vocab-adaptive gate picks the driver-local textbook loop for
    // small tables; forcing the limit to 0 exercises the distributed
    // per-merge argmax loop on the SAME input — merges, counts, and
    // bpe3's audit sums must agree exactly (incl. the UTF-8 tie-break)
    val docs = graft.Tables(spark, sf(), "documents")
    val tmp = graft.TempDirs.scratch("bpe-gate")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val localMerges = bpeTrain(docs, 8)
      .map(m => (m.rank, m.left, m.right, m.merged, m.pair_count))
    val localStats = bpe3SegmentStats(spark, tmp.toString).collect()(0)
    spark.conf.set("spark.graft.bpe.localVocabLimit", "0")
    try {
      val distMerges = bpeTrain(docs, 8)
        .map(m => (m.rank, m.left, m.right, m.merged, m.pair_count))
      val distStats = bpe3SegmentStats(spark, tmp.toString).collect()(0)
      assert(distMerges === localMerges)
      assert(distStats.toSeq === localStats.toSeq)
    } finally spark.conf.unset("spark.graft.bpe.localVocabLimit")
  }
}
