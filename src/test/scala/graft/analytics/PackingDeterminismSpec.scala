package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PK1 determinism: an epoch's packed layout is a *contract* — resuming
  * a run, re-running a failed job, or auditing what the model saw all
  * require that (bucket, first_seq, last_seq, straddles) per doc depend
  * only on the data, never on how the input happened to be partitioned
  * or ordered. The plan guarantees it structurally (bucket is a content
  * hash; the running total windows on ORDER BY doc_id within bucket);
  * this spec pins the property under adversarial physical layouts and
  * against a sequential single-threaded oracle.
  */
class PackingDeterminismSpec extends SparkSpec {

  private def layout(docs: DataFrame, seqLen: Int, buckets: Int): Map[Long, (Long, Long, Long, Boolean)] =
    CorpusQueries.packingPlanFrom(docs, "n_tok", seqLen, buckets)
      .select("doc_id", "bucket", "first_seq", "last_seq", "straddles")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("packed layout is invariant under repartition / sort / coalesce") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    (1 to 8).foreach { round =>
      val n = 1 + rng.nextInt(120)
      val base = (0 until n)
        .map(i => (i.toLong, 1L + rng.nextInt(700).toLong))
        .toDF("doc_id", "n_tok")
      val reference = layout(base, 512, 4)
      // three adversarial physical layouts of the same rows
      val shuffled = layout(base.repartition(7), 512, 4)
      val reversed = layout(base.orderBy($"doc_id".desc).repartition(3), 512, 4)
      val single = layout(base.coalesce(1), 512, 4)
      assert(reference == shuffled && reference == reversed && reference == single,
        s"round $round (n=$n): layout depends on physical partitioning")
    }
  }

  test("packed layout matches a sequential single-threaded oracle") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val docs = (0L until 200L).map(i => (i, 1L + rng.nextInt(900).toLong))
    val got = layout(docs.toDF("doc_id", "n_tok").repartition(5), 256, 3)
    // sequential concat-and-chop per bucket, in doc_id order
    docs.groupBy { case (id, _) => got(id)._1 }.foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, tok) =>
        val first = cum / 256
        cum += tok
        val last = (cum - 1) / 256
        val (_, gFirst, gLast, gStraddles) = got(id)
        assert(gFirst == first && gLast == last && gStraddles == (last > first),
          s"doc $id: got ${got(id)}, want ($first, $last, ${last > first})")
      }
    }
  }
}
