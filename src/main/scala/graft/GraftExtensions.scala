package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing the engine's native surface to any Spark
  * session — activate with `spark.sql.extensions=graft.GraftExtensions`
  * (or `withExtensions` on the builder). Two kinds of injection:
  *
  *   - SQL functions over the native codegen'd expressions
  *     (`hyperplane_signature`, `vector_dot`, `vector_sqdist`,
  *     `phrase_count`, `ipv6_bytes`, `ipv4_canonical`), so a user of
  *     the reference writing raw SQL gets the same kernels a DataFrame
  *     user gets from [[graft.analytics.SimilarityQueries]] and
  *     [[graft.enrich.GeoIpMapper]];
  *   - the [[graft.plans.BinnedIntervalJoinRule]] optimizer rule, which
  *     rewrites big-×-big point-in-interval joins (Spark's nested-loop
  *     fallback) into the binned equi join.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, arity: Int, usage: String)(
      build: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$usage takes exactly $arity argument(s)")
        build(children)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("hyperplane_signature", 1,
      "hyperplane_signature(embedding)") { children =>
      val (plus, minus) = analytics.SimilarityQueries.planeArrays
      graft.functions.HyperplaneSignature(children.head, plus, minus)
    })
    ext.injectFunction(fn("vector_dot", 2, "vector_dot(a, b)") { c =>
      graft.functions.VectorDot(c.head, c(1))
    })
    ext.injectFunction(fn("vector_sqdist", 2, "vector_sqdist(a, b)") { c =>
      graft.functions.VectorSqDist(c.head, c(1))
    })
    // phrase is a space-separated FOLDABLE string — the token sequence
    // is baked into the generated code, so it must be a literal
    ext.injectFunction(fn("phrase_count", 2,
      "phrase_count(toks, 'a b c')") { c =>
      require(c(1).foldable,
        "phrase_count: the phrase must be a string literal")
      val s = c(1).eval(null)
      require(s != null, "phrase_count: the phrase must be non-null")
      graft.functions.PhraseCount(c.head,
        s.toString.split(" ").toIndexedSeq.filter(_.nonEmpty))
    })
    ext.injectFunction(fn("ipv6_bytes", 1, "ipv6_bytes(ip)") { c =>
      graft.functions.Ipv6Bytes(c.head)
    })
    ext.injectFunction(fn("ipv4_canonical", 1, "ipv4_canonical(ip)") { c =>
      graft.functions.Ipv4Canonical(c.head)
    })
    ext.injectOptimizerRule(_ => plans.BinnedIntervalJoinRule)
  }
}
