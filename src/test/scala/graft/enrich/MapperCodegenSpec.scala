package graft.enrich

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The rule-table mappers must stay inside whole-stage codegen: at the
  * full uap-core / referers.yml table widths a careless chain shape
  * pushes the generated method past Janino's 64 KB limit and Spark
  * silently falls back to interpreted evaluation (a WARN, not an
  * error) — at 100 TB that is a several-fold scan slowdown nobody
  * sees. These specs attach an appender to the codegen loggers and
  * fail on the fallback message itself, pinning both mappers. */
class MapperCodegenSpec extends SparkSpec {

  test("referrer mapper: full-width chain compiles — no codegen fallback") {
    import spark.implicits._
    val refs = spark.range(512).select(
      concat(lit("https://www.google.com/search?q=term"), $"id").as("_referrer"))
    val out = ReferrerMapper(Seq("my.example.com")).apply(refs)
    val warns = capturingCodegenFallback { out.collect() }
    assert(!warns.exists(_.contains("Whole-stage codegen disabled")),
      s"codegen fell back:\n${warns.mkString("\n")}")
    // and the staged host is parsed ONCE, not once per rule branch
    val plan = out.queryExecution.executedPlan.toString
    val parses = "ParseUrlEvaluator\\(null,HOST".r.findAllIn(plan).length
    assert(parses <= 2, s"host parse inlined $parses times — staging lost")
  }

  test("user-agent mapper: full-width chain compiles — no codegen fallback") {
    import spark.implicits._
    val uas = spark.range(512).select(
      concat(lit("Mozilla/5.0 (Windows NT 10.0; rv:"), $"id",
        lit(") Chrome/120.0")).as("_user_agent"))
    val warns = capturingCodegenFallback { UserAgentMapper(uas).collect() }
    assert(!warns.exists(_.contains("Whole-stage codegen disabled")),
      s"codegen fell back:\n${warns.mkString("\n")}")
  }
}
