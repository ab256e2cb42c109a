package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-posture guarantees for the LSH family: candidate generation is
  * bounded per bucket even for pathological duplicate clusters, and the
  * hyperplane signature actually uses its full bit width. */
class LshScaleSpec extends SparkSpec {

  test("d2: a duplicate cluster yields capped candidate pairs, not k²") {
    import spark.implicits._
    val k = 200 // cluster of exact duplicates, 4× the bucket cap
    val docs = (0 until k)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val pairs = DedupQueries.d2From(docs).collect()
    val cap = DedupQueries.BucketCap
    // identical docs share every band bucket; the cap admits the first
    // `cap` docs per bucket → exactly C(cap, 2) pairs, not C(200, 2)
    assert(pairs.length == cap * (cap - 1) / 2,
      s"expected ${cap * (cap - 1) / 2} capped pairs, got ${pairs.length}")
    // every admitted doc is within the first `cap` by doc_id order
    assert(pairs.forall(r => r.getLong(0) < cap && r.getLong(1) < cap))
  }

  test("sim3: identical-vector cluster is capped per band bucket") {
    import spark.implicits._
    val k = 150
    val v = Array.tabulate(64)(i => (math.sin(i + 1) / 2).toFloat)
    val emb = (0 until k).map(i => (i.toLong, 0L, v)).toDF("vec_id", "label", "embedding")
    val pairs = SimilarityQueries.simNearDupFrom(emb).collect()
    val cap = SimilarityQueries.SimBucketCap
    // identical vectors share all 3 band values → one capped bucket per
    // band holding the same first-`cap` vec_ids → C(cap, 2) distinct pairs
    assert(pairs.length == cap * (cap - 1) / 2,
      s"expected ${cap * (cap - 1) / 2} capped pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) < cap && r.getLong(1) < cap))
  }

  test("signature spans 24 bits and separates a random corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val emb = (0 until 256)
      .map(i => (i.toLong, 0L, Array.fill(64)((rng.nextGaussian() / 4).toFloat)))
      .toDF("vec_id", "label", "embedding")
      .withColumn("sig", SimilarityQueries.signature($"embedding"))
    val sigs = emb.select("sig").as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < (1L << SimilarityQueries.NumBits)))
    // high bits are live (not the round-1 4-bit scheme)
    assert(sigs.exists(s => (s >> 20) != 0), "top signature bits never set")
    // 2²⁴ buckets over 256 random vectors → collisions should be rare
    val distinct = sigs.distinct.length
    assert(distinct > 250, s"expected near-unique signatures, got $distinct/256")
  }

  test("d5: chained near-dups collapse transitively to the min doc_id") {
    import spark.implicits._
    // A~B and B~C overlap heavily but A and C share little — cluster
    // assignment must still unify all three (transitivity through B)
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val mid = ((11 to 40).map(i => s"tok$i")).mkString(" ")
    val far = ((21 to 50).map(i => s"tok$i")).mkString(" ")
    val docs = Seq(
      (10L, base), (20L, base + " tail"), // near-identical pair
      (30L, mid), (40L, far), // chained via shared shingles
      (99L, "completely different words entirely here now")) // isolated
      .toDF("doc_id", "text")
    val out = DedupQueries.d5From(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // isolated doc is in no pair → absent from the cluster table
    assert(!out.contains(99L))
    // every clustered doc labels with its component min
    val clusters = out.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    clusters.foreach { case (label, members) => assert(label == members.min) }
    // the near-identical pair is definitely together
    assert(out.get(10L).isDefined && out(10L) == out(20L))
  }

  test("sim4 IVF: probes scan only the selected cells") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val emb = (0 until 200)
      .map(i => (i.toLong, i % 3L, Array.fill(64)((rng.nextGaussian() / 4).toFloat)))
      .toDF("vec_id", "label", "embedding")
    val out = SimilarityQueries.simIvfFrom(emb).collect()
    assert(out.length == 10)
    // every result's cell is one of the probed (top-IvfProbes) cells —
    // cells are centroid ids < IvfCells
    val cells = out.map(_.getAs[Long]("cell")).distinct
    assert(cells.length <= SimilarityQueries.IvfProbes)
    assert(cells.forall(c => c >= 0 && c < SimilarityQueries.IvfCells))
  }

  test("sim2 banded probing admits only band-sharing candidates") {
    import spark.implicits._
    // base vector + mild perturbations; every admitted candidate must
    // share >=1 of the 3 signature bands with the query, and close
    // perturbations must be recalled
    val rng = new scala.util.Random(11)
    val base = Array.fill(64)((rng.nextGaussian() / 4).toFloat)
    val rows = (0L until 40L).map { i =>
      val arr = base.clone()
      if (i > 0) { val j = rng.nextInt(64); arr(j) = arr(j) + (rng.nextGaussian() / 8).toFloat }
      (i, i % 3, arr)
    }
    val emb = rows.toDF("vec_id", "label", "embedding")
    val out = SimilarityQueries.simAnnLshFrom(emb)
    val sigOf = emb.withColumn("sig", SimilarityQueries.signature($"embedding"))
      .select($"vec_id", $"sig").as[(Long, Long)].collect().toMap
    val q = sigOf(0L)
    def sharesBand(s: Long): Boolean = (0 until SimilarityQueries.NumBands).exists { b =>
      ((s ^ q) >> (SimilarityQueries.BandBits * b) & 255) == 0
    }
    val admitted = out.select("vec_id").as[Long].collect().toSet
    assert(admitted.nonEmpty, "single-bit-flip neighbours must be recalled")
    admitted.foreach { v =>
      assert(sharesBand(sigOf(v)), s"vec $v admitted without sharing a band")
    }
  }
}
