package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of contiguous occurrences of a fixed token phrase inside a
  * token array — the r3 exact-phrase contamination probe's kernel.
  *
  * The portable formulation, `size(filter(sequence(0, n-k), i -> toks
  * [i] = 'a' AND toks[i+1] = 'b' ...))`, is a Catalyst higher-order
  * function: `CodegenFallback`, per-row sequence materialization, and
  * an interpreted lambda per window. Fine as the executable spec (the
  * DuckDB twin mirrors it), wrong as the inner loop of a corpus scan.
  * This expression is the production kernel: one plan node whose
  * generated code is a tight windowed UTF8String comparison loop
  * inside whole-stage codegen.
  *
  * Parity with the HOF spec is exact (PhraseCountSpec property-tests
  * random corpora): same window starts, null elements never match
  * (split() produces none), arrays shorter than the phrase count 0 —
  * the CASE guard the HOF needs against Spark's descending
  * `sequence()` is unnecessary here. */
final case class PhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression {

  require(phrase.nonEmpty, "phrase must have at least one token")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"requires array<string> input, got $t")
  }

  @transient private lazy val phraseU8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val k = phraseU8.length
    var count = 0L
    var i = 0
    while (i <= n - k) {
      var j = 0
      var ok = true
      while (ok && j < k) {
        ok = !toks.isNullAt(i + j) &&
          toks.getUTF8String(i + j).equals(phraseU8(j))
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: the JAVA-SOURCE array spelling — classOf[...].getName yields
    // the JVM-internal "[L...;" form, which Janino rejects mid-cast
    val ref = ctx.addReferenceObj("phrase", phraseU8,
      classOf[UTF8String].getName + "[]")
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $toks.numElements();
         |int $k = $ref.length;
         |long $cnt = 0L;
         |for (int $i = 0; $i <= $n - $k; $i++) {
         |  boolean $ok = true;
         |  for (int $j = 0; $ok && $j < $k; $j++) {
         |    $ok = !$toks.isNullAt($i + $j) &&
         |      $toks.getUTF8String($i + $j).equals($ref[$j]);
         |  }
         |  if ($ok) $cnt++;
         |}
         |${ev.value} = $cnt;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
