package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression computing the sparse-ternary
  * random-hyperplane LSH signature of a float-array embedding.
  *
  * The Column-algebra formulation of the same computation is a ~500-node
  * expression tree (24 bits × ~20 CASE/CAST/ADD nodes) — correct, but
  * every query that carries it pays a large codegen+JIT compile before
  * the first row flows. This expression collapses the tree to ONE node
  * whose generated code is two tight loops over compiled index arrays,
  * so it stays inside whole-stage codegen with constant compile cost
  * regardless of bit width — the preferred extension mechanism when
  * built-in operators genuinely can't express the shape efficiently.
  *
  * Semantics are bit-identical to the Column/SQL twins: per bit, the
  * plus-indexed elements (ascending index, double accumulator) minus
  * the minus-indexed elements; strictly positive projection sets the
  * bit. Fold order matters for float parity and is preserved exactly.
  */
final case class HyperplaneSignature(
    child: Expression,
    plus: Array[Array[Int]],
    minus: Array[Array[Int]]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<float>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < plus.length) {
      // association order MUST match the Column/SQL twins exactly:
      // (p0+p1+…) - (m0+m1+…), ONE subtraction — sequential s-=m_i
      // rounds differently in IEEE-754 and can flip a near-zero sign
      // bit between this expression and the DuckDB oracle
      var ps = 0.0d
      val p = plus(b)
      var i = 0
      while (i < p.length) { ps += arr.getFloat(p(i)).toDouble; i += 1 }
      var ms = 0.0d
      val m = minus(b)
      i = 0
      while (i < m.length) { ms += arr.getFloat(m(i)).toDouble; i += 1 }
      if (ps - ms > 0.0d) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val plusRef = ctx.addReferenceObj("plus", plus, "int[][]")
    val minusRef = ctx.addReferenceObj("minus", minus, "int[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val ps = ctx.freshName("ps")
      val ms = ctx.freshName("ms")
      val p = ctx.freshName("p")
      val m = ctx.freshName("m")
      // same association order as the Column/SQL twins:
      // (p0+p1+…) - (m0+m1+…), one subtraction (see nullSafeEval)
      s"""
         |long $sig = 0L;
         |for (int $b = 0; $b < $plusRef.length; $b++) {
         |  double $ps = 0.0d;
         |  int[] $p = $plusRef[$b];
         |  for (int $i = 0; $i < $p.length; $i++) {
         |    $ps += (double) $arr.getFloat($p[$i]);
         |  }
         |  double $ms = 0.0d;
         |  int[] $m = $minusRef[$b];
         |  for (int $i = 0; $i < $m.length; $i++) {
         |    $ms += (double) $arr.getFloat($m[$i]);
         |  }
         |  if ($ps - $ms > 0.0d) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
