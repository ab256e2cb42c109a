package graft.analytics

import graft.{SparkSpec, Tables}

/** d15 against an INDEPENDENT naive reference. The DuckDB oracle pins
  * cross-engine parity but shares d15's formulation (gram hash → count
  * → rank → islands); this spec re-derives keep-first substring
  * trimming from the definition alone — plain Scala collections over
  * gram STRINGS (no hashing, no windows, no joins) — and demands exact
  * equality on randomized corpora: big-vocab docs with planted shared
  * spans (cross-doc and within-doc, overlapping plants included) and
  * tiny-vocab (two-token) docs where nearly every gram duplicates
  * naturally, under both the default and a tightened occurrence cap.
  */
class SubstringTrimPropertySpec extends SparkSpec {

  private val K = 10 // DedupQueries.SpanGram
  private val MinSpan = 20 // DedupQueries.MinSpanTokens

  /** Definition-first reference: every K-gram occurrence keyed by its
    * TEXT; grams occurring 2..occCap times keep their lowest
    * (doc_id, pos) occurrence; other occurrences mark positions;
    * consecutive positions merge to runs; runs spanning >= MinSpan
    * tokens delete their token range. */
  private def naive(docs: Seq[(Long, Seq[String])],
                    occCap: Long): Map[Long, (Long, Long, String)] = {
    val grams = for {
      (id, toks) <- docs if toks.size >= K
      p <- 1 to (toks.size - K + 1)
    } yield (toks.slice(p - 1, p - 1 + K).mkString(" "), id, p)
    val dup = grams.groupBy(_._1).collect {
      case (g, occ) if occ.size > 1 && occ.size <= occCap => g
    }.toSet
    val trimmedPos: Map[Long, Seq[Int]] = grams
      .filter(g => dup(g._1))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (_, occ) => occ.sortBy(o => (o._2, o._3)).drop(1) }
      .map(o => (o._2, o._3))
      .groupBy(_._1)
      .map { case (id, ps) => id -> ps.map(_._2).distinct.sorted }
    val spansByDoc: Map[Long, Seq[(Int, Int)]] = trimmedPos.map {
      case (id, ps) =>
        val runs = ps.foldLeft(List.empty[List[Int]]) {
          case (acc @ (run :: rest), p) if p == run.head + 1 =>
            (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }.map(_.reverse).reverse
        id -> runs
          .map(r => (r.head, r.last + K - 1))
          .filter { case (s, e) => e - s + 1 >= MinSpan }
    }
    docs.map { case (id, toks) =>
      val spans = spansByDoc.getOrElse(id, Seq.empty)
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !spans.exists(sp => i + 1 >= sp._1 && i + 1 <= sp._2) => t
      }
      id -> ((toks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def viaSpark(docs: Seq[(Long, Seq[String])],
                       occCap: Long): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val dir = graft.TempDirs.scratch("graft-trim-prop").toString
    docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DedupQueries.d15From(Tables(spark, dir, "documents"), occCap)
      .collect()
      .map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_toks"), r.getAs[Long]("kept_toks"),
            r.getAs[String]("text_deduped")))
      }.toMap
  }

  private def check(docs0: Seq[(Long, Seq[String])], occCap: Long,
                    label: String): Unit = {
    // Model the text round-trip the engine actually sees: both Spark's
    // split and DuckDB's string_split turn an empty text into [""] —
    // one empty token — and the oracle pins d15 to that convention.
    val docs = docs0.map { case (id, toks) =>
      id -> (if (toks.isEmpty) Seq("") else toks)
    }
    val expect = naive(docs, occCap)
    val got = viaSpark(docs, occCap)
    assert(got.keySet == expect.keySet, s"$label: doc set")
    expect.foreach { case (id, e) =>
      assert(got(id) == e, s"$label: doc $id")
    }
  }

  test("d15 == naive reference on planted-span corpora (seeded random)") {
    val rnd = new scala.util.Random(1014)
    for (iter <- 1 to 8) {
      // span templates long enough to trim, short enough to overlap
      val templates = Seq.fill(3)(
        Seq.fill(5 + rnd.nextInt(41))(s"t${rnd.nextInt(50)}_${rnd.nextInt(1000)}"))
      val docs = (1L to (4 + rnd.nextInt(5)).toLong).map { id =>
        var toks = Seq.fill(rnd.nextInt(80))(s"w${rnd.nextInt(5000)}")
        // plant 0..3 template copies at random offsets (overlap allowed)
        (0 until rnd.nextInt(4)).foreach { _ =>
          val t = templates(rnd.nextInt(templates.size))
          val at = if (toks.isEmpty) 0 else rnd.nextInt(toks.size + 1)
          toks = toks.take(at) ++ t ++ toks.drop(at)
        }
        id -> toks
      }
      check(docs, occCap = 1000L, s"planted iter $iter")
    }
  }

  test("d15 == naive reference on tiny-vocab corpora, default and " +
    "tight occurrence caps") {
    val rnd = new scala.util.Random(2718)
    for (iter <- 1 to 6) {
      val docs = (1L to (3 + rnd.nextInt(4)).toLong).map { id =>
        id -> Seq.fill(rnd.nextInt(70))(if (rnd.nextBoolean()) "a" else "b")
      }
      check(docs, occCap = 1000L, s"tiny-vocab iter $iter")
      check(docs, occCap = 3L, s"tiny-vocab capped iter $iter")
    }
  }

  test("d15 == naive reference on boundary shapes: empty doc, doc of " +
    "exactly K tokens duplicated, span ending at doc end") {
    val span = (1 to MinSpan + 5).map(i => s"s$i")
    val exactK = (1 to K).map(i => s"k$i")
    val docs = Seq(
      1L -> Seq.empty[String],
      2L -> exactK,
      3L -> exactK, // K-token full-doc duplicate: run below MinSpan, kept
      4L -> ((1 to 12).map(i => s"x$i") ++ span), // span flush at doc end
      5L -> (span ++ (1 to 12).map(i => s"y$i")))
    check(docs, occCap = 1000L, "boundary")
  }
}
