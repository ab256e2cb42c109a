package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stream-stream time-bounded join: the streaming twin of the batch
  * as-of/interval family. The spec replays two event logs as file
  * streams and proves the streaming join equals the batch join over the
  * same frames — and that both watermarks are present in the plan (the
  * state-boundedness contract: without them the join's state grows
  * forever). */
class TimeBoundedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writeLog(rows: Seq[(String, String)], tsCol: String,
      dir: String) = {
    val df = rows.toDF("user", "t")
      .select($"user", $"t".cast("timestamp").as(tsCol))
    df.write.mode("overwrite").parquet(dir)
    df
  }

  test("streaming time-bounded join == batch join; state is watermark-bounded") {
    val base = graft.TempDirs.scratch("graft-ssj").toString
    // clicks (left) attract purchases (right) within 30 minutes
    val clicks = writeLog(Seq(
      ("u1", "2024-01-01 10:00:00"),
      ("u1", "2024-01-01 12:00:00"),
      ("u2", "2024-01-01 10:05:00")), "l_ts", s"$base/l")
    val purchases = writeLog(Seq(
      ("u1", "2024-01-01 10:20:00"), // joins the 10:00 click only
      ("u1", "2024-01-01 12:29:59"), // boundary-inclusive on the 12:00 click
      ("u2", "2024-01-01 11:00:00"), // outside 30 min: no match
      ("u3", "2024-01-01 10:10:00")), "r_ts", s"$base/r") // no click: no match

    val lStream = Subscriptions.fileStream(spark, clicks.schema, s"$base/l")
    val rStream = Subscriptions.fileStream(spark, purchases.schema, s"$base/r")
    val joined = Subscriptions.timeBoundedJoin(
      lStream, rStream, key = "user", window = "30 MINUTES",
      watermark = "1 hour")

    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .select($"user", $"l_ts".cast("string"), $"r_ts".cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      val want = Subscriptions.timeBoundedJoin(clicks, purchases,
          "user", "30 MINUTES", "1 hour")
        .select($"user", $"l_ts".cast("string"), $"r_ts".cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got == want)
      assert(got == Set(
        ("u1", "2024-01-01 10:00:00", "2024-01-01 10:20:00"),
        ("u1", "2024-01-01 12:00:00", "2024-01-01 12:29:59")))
      // boundedness: both sides must carry event-time watermarks
      val plan = joined.queryExecution.analyzed.toString
      assert(plan.split("EventTimeWatermark").length - 1 == 2,
        "both join inputs must be watermarked or state grows forever")
    } finally q.stop()
  }
}
