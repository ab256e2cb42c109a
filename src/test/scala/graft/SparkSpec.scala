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
    * ONLY the declared input-spread rescue ([[Tables.spread]]), which
    * exists when a scan's natural split count cannot feed the cores
    * (single-row-group local fixtures) and short-circuits away at
    * scale. Plan pins that assert "operator X must not shuffle" mean
    * X's algorithm: the rescue exchange is input plumbing, counted by
    * none of them. The exemption is pinned to the spread's exact shape
    * (r17 advice — the old origin-only test exempted EVERY
    * REPARTITION_BY_* exchange, so a stray algorithmic
    * `.repartition(n)` could hide from a "no shuffle" pin):
    * `repartition(defaultParallelism, col(tableKey))`, i.e. origin
    * REPARTITION_BY_NUM hash-partitioned on a single declared
    * [[Tables.spreadKeys]] attribute. */
  private val spreadExchangeRe = {
    val keys = Tables.spreadKeys.values.mkString("|")
    (s"hashpartitioning\\((?:$keys)#\\d+[L]?, \\d+\\)").r
  }
  def algoExchangeLines(plan: String): Seq[String] =
    plan.linesIterator.filter(l =>
      l.contains("Exchange") &&
        !(l.contains("REPARTITION_BY_NUM") &&
          spreadExchangeRe.findFirstIn(l).isDefined)).toSeq

  /** The collect-based twin of [[algoExchangeLines]] for non-AQE
    * executed plans. */
  def algoShuffles(plan: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeExec}
    def isSpread(e: ShuffleExchangeExec): Boolean =
      e.shuffleOrigin == REPARTITION_BY_NUM &&
        (e.outputPartitioning match {
          case HashPartitioning(Seq(a: AttributeReference), _) =>
            Tables.spreadKeys.values.exists(_ == a.name)
          case _ => false
        })
    plan.collect { case e: ShuffleExchangeExec if !isSpread(e) => e }
  }
}
