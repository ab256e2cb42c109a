package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.TempDirs.scratch("graft-warehouse").toString)
      .withExtensions(new GraftExtensions())
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Runs `body` while capturing WARN+ messages of Spark's whole-stage
    * codegen escape hatch (the silent Janino 64 KB fallback); returns
    * the captured lines. Shared by the mapper and registry codegen
    * lints so the logger wiring can't drift between them. */
  def capturingCodegenFallback(body: => Unit): Seq[String] = {
    import org.apache.log4j.{AppenderSkeleton, Level, Logger}
    import org.apache.log4j.spi.LoggingEvent
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender = new AppenderSkeleton {
      override def append(e: LoggingEvent): Unit =
        if (e.getLevel.isGreaterOrEqual(Level.WARN))
          captured += String.valueOf(e.getMessage)
      override def close(): Unit = ()
      override def requiresLayout(): Boolean = false
    }
    val loggers = Seq(
      Logger.getLogger("org.apache.spark.sql.execution.WholeStageCodegenExec"),
      Logger.getLogger(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"))
    loggers.foreach(_.addAppender(appender))
    try body finally loggers.foreach(_.removeAppender(appender))
    captured.toSeq
  }

  /** Lines of a plan string that are ALGORITHMIC exchanges — excludes
    * the declared input-spread repartition ([[Tables.spread]], shuffle
    * origin REPARTITION_BY_COL), which exists only when a scan's
    * natural split count cannot feed the cores (single-row-group local
    * fixtures) and short-circuits away at scale. Plan pins that assert
    * "operator X must not shuffle" mean X's algorithm: the rescue
    * exchange is input plumbing, counted by none of them. */
  def algoExchangeLines(plan: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("REPARTITION_BY_")).toSeq

  /** The collect-based twin of [[algoExchangeLines]] for non-AQE
    * executed plans. */
  def algoShuffles(plan: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] = {
    import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_COL, REPARTITION_BY_NUM, ShuffleExchangeExec}
    plan.collect {
      case e: ShuffleExchangeExec
        if e.shuffleOrigin != REPARTITION_BY_COL &&
          e.shuffleOrigin != REPARTITION_BY_NUM => e
    }
  }
}
