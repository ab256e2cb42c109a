package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing the engine's native expressions to SQL —
  * activate with `spark.sql.extensions=graft.GraftExtensions` (or
  * `withExtensions` on the builder). A user of the reference writing
  * raw SQL gets the same functions a DataFrame user gets from
  * [[graft.analytics.SimilarityQueries.signature]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_signature"),
      new ExpressionInfo(
        classOf[graft.functions.HyperplaneSignature].getName,
        "hyperplane_signature"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "hyperplane_signature(embedding) takes exactly one argument")
        val (plus, minus) = analytics.SimilarityQueries.planeArrays
        graft.functions.HyperplaneSignature(children.head, plus, minus)
      }))
  }
}
