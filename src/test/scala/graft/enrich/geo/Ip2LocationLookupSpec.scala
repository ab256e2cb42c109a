package graft.enrich.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ip2LocationCsv.rangeLookup]] picks its plan BY the dim's measured
  * size (r14 verdict #6): under the comfort line it broadcasts (the
  * cheap BNLJ every round has shipped); over it, it bin-shards — the
  * j9 BinnedIntervalJoinRule pattern on the IP axis — instead of
  * broadcasting a dim that measured 1354 MB of a 1536 MB line at
  * DB11 scale. Both paths must produce identical rows, and each must
  * plan the shape it promises. */
class Ip2LocationLookupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val f = graft.TempDirs.scratch("graft-ip2l-lookup").resolve("db.csv")
    // contiguous + gapped ranges, one spanning many /16 blocks (bin
    // explode must cover every block a wide range touches)
    val lines = (0 until 64).map { i =>
      val lo = i.toLong * 200000
      val hi = lo + (if (i % 7 == 0) 199999 else 99999) // wide vs gapped
      s""""$lo","$hi","C$i","Country $i","Region ${i % 5}","City $i","$i.5","-$i.25""""
    }
    java.nio.file.Files.write(f,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Ip2LocationCsv.rangeDim(spark, f.toString)
  }

  test("both plans, identical rows — including misses as NULL geo") {
    val dim = fixture()
    val probes = spark.range(0, 4000)
      .select(($"id" * 3331).as("ipnum")) // hits, gap-misses, past-the-end
    def rows(comfort: Long) =
      Ip2LocationCsv.rangeLookup(probes, $"ipnum", dim, comfortBytes = comfort)
        .select($"ipnum", $"_country_code", $"_city")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
    val viaBroadcast = rows(Long.MaxValue)
    val viaBinned = rows(0L)
    assert(viaBroadcast.length == 4000 && viaBinned.length == 4000,
      "left-join cardinality broken (probe lost or duplicated)")
    assert(viaBroadcast.sameElements(viaBinned),
      "bin-sharded path diverged from broadcast path")
    assert(viaBroadcast.exists(_._2 == null), "fixture has no misses")
    // ~55% of probes land in a range (gapped ranges cover half their
    // slot; probes past 12.8M all miss)
    assert(viaBroadcast.count(_._2 != null) > 1500)
  }

  test("the plan matches the promise: broadcast under the line, " +
    "shuffled equi join with NO broadcast-nested-loop over it") {
    val dim = fixture()
    val probes = spark.range(0, 100).select(($"id" * 99991).as("ipnum"))
    def planOf(comfort: Long) =
      Ip2LocationCsv.rangeLookup(probes, $"ipnum", dim, comfortBytes = comfort)
        .queryExecution.executedPlan.toString
    val small = planOf(Long.MaxValue)
    assert(small.contains("BroadcastNestedLoopJoin"),
      s"small dim should broadcast:\n$small")
    val big = planOf(0L)
    assert(!big.contains("BroadcastNestedLoopJoin") &&
      !big.contains("CartesianProduct"),
      s"big dim must not nested-loop:\n$big")
    assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin")
      || big.contains("BroadcastHashJoin"),
      s"big dim should equi-join on the bin:\n$big")
  }

  test("a range spanning many bins matches probes in EVERY block it covers") {
    val dim = fixture()
    // range 0 covers [0, 199999] — blocks 0..3 at 2^16 width; probe
    // each block
    val probes = Seq(1000L, 70000L, 140000L, 199999L, 200001L).toDF("ipnum")
    val out = Ip2LocationCsv.rangeLookup(probes, $"ipnum", dim,
        comfortBytes = 0L)
      .select($"ipnum", $"_country_code").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1000L) == "Country 0" && out(70000L) == "Country 0" &&
      out(140000L) == "Country 0" && out(199999L) == "Country 0")
    assert(out(200001L) == "Country 1")
  }
}
