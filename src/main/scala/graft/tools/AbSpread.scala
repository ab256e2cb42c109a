package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved in-JVM A/B of the [[graft.Tables]] scan-spread rescue:
  * times the named registry queries with the spread enabled and
  * disabled, ALTERNATING per repetition inside one JVM, so boot-window
  * contention (the sandbox's dominant noise source — see
  * OPTIMIZATION_r17.md) hits both arms equally. Prints per-query
  * medians for each arm.
  *
  * Usage: runMain graft.tools.AbSpread <sfDir> <reps> q1,q2,...
  */
object AbSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions())
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val selected = graft.SparkEntry.registry.filter(q => names(q._1))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    for ((name, qd) <- selected) {
      val on = collection.mutable.ArrayBuffer[Double]()
      val off = collection.mutable.ArrayBuffer[Double]()
      (1 to reps).foreach { _ =>
        sys.props("graft.spread.min.bytes") = "16384"
        on += time(qd.build(spark, sfDir).queryExecution.toRdd.count())
        sys.props("graft.spread.min.bytes") = "999999999999"
        off += time(qd.build(spark, sfDir).queryExecution.toRdd.count())
      }
      def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
      println(f"[ab] $name%-26s on=${med(on.toSeq)}%7.3f off=${med(off.toSeq)}%7.3f  (raw on=${on.map(x => f"$x%.2f").mkString(",")} off=${off.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
