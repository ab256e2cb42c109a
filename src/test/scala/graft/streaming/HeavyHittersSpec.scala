package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** SpaceSaving guarantees against exact batch counts on a skewed
  * stream: never undercounts, overcount bounded by err, every
  * sufficiently frequent item tracked, state bounded by capacity. */
class HeavyHittersSpec extends SparkSpec {

  private val Capacity = 8
  private val Shards = 4

  /** Zipf-ish item stream: item k appears ~N/k times, plus noise items
    * appearing once each. */
  private def wave(round: Int): Seq[HHItem] = {
    val hot = (1 to 10).flatMap(k =>
      Seq.fill(60 / k)(HHItem(s"hot$k")))
    val noise = (0 until 40).map(i => HHItem(s"noise${round}_$i"))
    hot ++ noise
  }

  test("estimates bracket exact counts; frequent items are all tracked; " +
    "state stays within capacity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[HHItem]
    val q = HeavyHitters.track(mem.toDS(), Capacity, Shards)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      val all = wave(1) ++ wave(2)
      mem.addData(wave(1): _*)
      q.processAllAvailable()
      mem.addData(wave(2): _*)
      q.processAllAvailable()

      // latest summary per shard = the max-n row (n is monotone)
      val latest = spark.table("hh_out").as[HHSummary].collect()
        .groupBy(_.shard).map { case (_, rows) => rows.maxBy(_.n) }.toSeq
      val exact = all.groupBy(_.item).view.mapValues(_.size.toLong).toMap
      val perShardN = all.groupBy(e =>
        HeavyHitters.shardOf(e.item, Shards)).view.mapValues(_.size.toLong)

      for (s <- latest) {
        assert(s.counters.size <= Capacity)
        assert(s.n == perShardN(s.shard))
        for (c <- s.counters) {
          val truth = exact.getOrElse(c.item, 0L)
          assert(c.count >= truth, s"undercount: $c vs $truth")
          assert(c.count - c.err <= truth, s"overcount past err: $c vs $truth")
        }
      }
      // every item whose true count exceeds its shard's n/capacity must
      // be tracked (the SpaceSaving frequent-item guarantee)
      val tracked = latest.flatMap(_.counters.map(_.item)).toSet
      for ((item, truth) <- exact) {
        val shard = HeavyHitters.shardOf(item, Shards)
        if (truth > perShardN(shard) / Capacity)
          assert(tracked(item), s"frequent item $item ($truth) not tracked")
      }
      // and the hottest items are unambiguously present
      assert(Seq("hot1", "hot2", "hot3").forall(tracked))
    } finally q.stop()
  }
}
