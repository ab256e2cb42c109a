package graft.store

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order clustering: the content is unchanged, and per-file min/max
  * stats (what parquet row-group skipping keys on) overlap a
  * two-dimensional predicate in far fewer files than the arrival-order
  * layout. */
class ZOrderSpec extends SparkSpec {

  private lazy val spark0 = spark
  import spark0.implicits._

  private val NumFiles = 16

  /** Per-file (min,max) of both clustered dims — the footer stats a
    * pushed filter would consult. */
  private def fileStats(path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min($"user_id").as("umin"), max($"user_id").as("umax"),
        min($"value").as("vmin"), max($"value").as("vmax"))

  private def overlapping(stats: DataFrame, user: Long,
      lo: Double, hi: Double): Long =
    stats.filter($"umin" <= user && $"umax" >= user &&
      $"vmin" <= hi && $"vmax" >= lo).count()

  test("z-ordered files skip a 2-D predicate the time-ordered layout " +
    "cannot; rows are preserved exactly") {
    val ev = Tables(spark, sf(), "events")
      .select($"event_id", $"user_id", $"value", $"ts")
    val base = graft.TempDirs.scratch("graft-z").toString

    // arrival order: the natural append layout (clustered by time)
    ev.repartitionByRange(NumFiles, $"ts").sortWithinPartitions($"ts")
      .write.parquet(s"$base/linear")
    ZOrder.write(ev, Seq("user_id", "value"), s"$base/zorder", NumFiles)

    // clustering is a permutation, not a transformation
    val before = ev.collect().map(_.toSeq).toSet
    val after = spark.read.parquet(s"$base/zorder").collect().map(_.toSeq).toSet
    assert(after == before)
    assert(spark.read.parquet(s"$base/zorder").inputFiles.length == NumFiles)

    // a selective 2-D box: one user × a value band
    val user = ev.groupBy($"user_id").count().orderBy(desc("count"))
      .head().getLong(0)
    val (lo, hi) = (100.0, 160.0)
    val linHit = overlapping(fileStats(s"$base/linear"), user, lo, hi)
    val zHit = overlapping(fileStats(s"$base/zorder"), user, lo, hi)
    // time-ordered files all span the full user/value range
    assert(linHit == NumFiles.toLong,
      s"expected the linear layout to overlap everywhere, got $linHit")
    assert(zHit * 2 <= linHit,
      s"z-order should halve the candidate files at worst: $zHit vs $linHit")
    // and the predicate's actual rows are intact through the layout
    val expect = ev.filter($"user_id" === user && $"value".between(lo, hi))
      .count()
    val got = spark.read.parquet(s"$base/zorder")
      .filter($"user_id" === user && $"value".between(lo, hi)).count()
    assert(got == expect && expect > 0)
  }

  test("a constant column degrades gracefully (no divide-by-zero) and " +
    "single-column z-order is a plain range sort") {
    val df = spark.range(0, 1000)
      .select($"id", lit(7.0).as("c"), ($"id" % 10).cast("double").as("v"))
    val zc = ZOrder.cluster(df, Seq("c", "v"), 4)
    assert(zc.count() == 1000)
    val one = ZOrder.cluster(df, Seq("id"), 4)
    // contiguous id ranges per partition: max of part k < min of part k+1
    val parts = one.withColumn("p", spark_partition_id())
      .groupBy($"p").agg(min($"id").as("mn"), max($"id").as("mx"))
      .orderBy($"mn").collect()
      .map(r => (r.getAs[Long]("mn"), r.getAs[Long]("mx")))
    assert(parts.sliding(2).forall {
      case Array((_, amx), (bmn, _)) => amx < bmn
      case _ => true
    })
  }
}
