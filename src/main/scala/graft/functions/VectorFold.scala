package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native element-wise fold over two numeric arrays — the hot kernel of
  * every similarity/clustering query (dot products and squared L2
  * distances over 64-d embeddings).
  *
  * The portable formulation, `aggregate(zip_with(a, b, ...), 0.0,
  * (acc, v) -> acc + v)`, is a Catalyst higher-order function: HOFs are
  * `CodegenFallback` — each row leaves whole-stage codegen, allocates an
  * intermediate zipped array, and evaluates the lambda interpretively
  * per element. Fine as an executable cross-engine spec, wrong as the
  * inner loop of an O(candidates · dims) scorer. This expression is the
  * production kernel: ONE plan node whose generated code is a tight
  * cast-multiply-accumulate loop, staying inside whole-stage codegen.
  *
  * Semantic parity with the HOF spec is exact and property-tested
  * (VectorFoldSpec):
  *  - elements are cast to double and folded LEFT-TO-RIGHT in a double
  *    accumulator — the same association order as `aggregate` and the
  *    DuckDB `list_reduce` twin, so results are bit-identical IEEE-754;
  *  - null array, mismatched lengths, or any null element → null (the
  *    HOF yields null through null-padded zip / null lambda results).
  */
abstract class VectorFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires two array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  /** Per-element contribution, e.g. x*y or (x-y)². */
  protected def combine(x: Double, y: Double): Double

  /** Java source of [[combine]] for codegen; `x`/`y` are double vars. */
  protected def combineCode(x: String, y: String): String

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
      acc += combine(x, y)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, e: Expression): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $xs.numElements();
         |if ($ys.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($xs.isNullAt($i) || $ys.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${get(xs, i, left)};
         |    double $y = ${get(ys, i, right)};
         |    $acc += ${combineCode(x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
         |""".stripMargin
    })
  }
}

/** dot(a, b) = Σ aᵢ·bᵢ, left-to-right double fold. */
final case class VectorDot(left: Expression, right: Expression) extends VectorFold {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖a−b‖² = Σ (aᵢ−bᵢ)², left-to-right double fold. */
final case class VectorSqDist(left: Expression, right: Expression) extends VectorFold {
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineCode(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
