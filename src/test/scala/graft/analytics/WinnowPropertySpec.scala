package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** t_winnow against (a) an independent naive reference and (b) the
  * winnowing GUARANTEE itself. The DuckDB oracle restates the window-
  * min mechanics; neither it nor the mechanics spec pins Schleimer et
  * al.'s actual contract — every shared run of ≥ w+k−1 tokens between
  * two documents selects at least one common fingerprint (the theorem
  * that makes the sampled set usable for plagiarism/dup detection) —
  * so this spec derives fingerprints from the definition alone (plain
  * Scala, JVM MessageDigest md5) and then checks the guarantee on
  * planted spans at every alignment.
  */
class WinnowPropertySpec extends SparkSpec {

  private val K = TextQueries.WinnowK
  private val W = TextQueries.WinnowW

  /** hash60 re-derived independently: first 15 hex chars of md5. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def naive(toks: Seq[String]): Set[Long] = {
    if (toks.size < K + W - 1) return Set.empty
    val gh = toks.sliding(K).map(g => hash60(g.mkString(" "))).toVector
    (0 to gh.size - W).map(i => gh.slice(i, i + W).min).toSet
  }

  private def viaSpark(docs: Seq[(Long, Seq[String])]): Map[Long, Set[Long]] = {
    import spark.implicits._
    val df: DataFrame = docs
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    TextQueries.winnowFingerprints(df)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("winmin"))
      .groupBy(_._1).map { case (id, fps) => id -> fps.map(_._2).toSet }
  }

  test("fingerprint sets equal the naive reference on seeded random " +
    "docs, including sub-threshold and boundary lengths") {
    val rnd = new scala.util.Random(271828)
    val docs = (1L to 40L).map { id =>
      // lengths straddle the k+w-1 threshold; small vocab forces
      // repeated grams (duplicate window minima, the distinct path)
      val n = rnd.nextInt(3) match {
        case 0 => rnd.nextInt(K + W) // mostly below threshold
        case 1 => K + W - 1 + rnd.nextInt(4) // at/near threshold
        case _ => 20 + rnd.nextInt(60)
      }
      id -> Seq.fill(n)(s"v${rnd.nextInt(12)}")
    }
    val got = viaSpark(docs)
    docs.foreach { case (id, toks) =>
      val expect = naive(toks)
      assert(got.getOrElse(id, Set.empty) == expect, s"doc $id (n=${toks.size})")
    }
  }

  test("guarantee: a shared run of w+k-1 tokens selects a common " +
    "fingerprint at EVERY alignment in both documents") {
    val rnd = new scala.util.Random(16180)
    val span = (1 to K + W - 1).map(i => s"g$i") // exactly threshold
    for (trial <- 1 to 12) {
      // unique filler so only the planted span is shared
      def filler(tag: String, n: Int) =
        (0 until n).map(i => s"$tag${trial}_$i")
      val a = filler("a", rnd.nextInt(30)) ++ span ++ filler("b", rnd.nextInt(30))
      val c = filler("c", rnd.nextInt(30)) ++ span ++ filler("d", rnd.nextInt(30))
      val fps = viaSpark(Seq(1L -> a, 2L -> c))
      assert(fps(1L).intersect(fps(2L)).nonEmpty,
        s"trial $trial: shared ${K + W - 1}-token span selected no " +
          "common fingerprint")
    }
  }

  test("no false sharing: documents with no common k-gram share no " +
    "fingerprint") {
    val a = (1 to 40).map(i => s"only_a_$i")
    val b = (1 to 40).map(i => s"only_b_$i")
    val fps = viaSpark(Seq(1L -> a, 2L -> b))
    assert(fps(1L).intersect(fps(2L)).isEmpty)
  }
}
