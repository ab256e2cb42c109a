package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Catalyst expression probing a packed bloom-filter bitmap: for
  * an input 60-bit content hash, tests whether all `k` affine bit
  * positions `(a_j · (h mod p) + b_j) mod m` are set.
  *
  * This is the production form of the probe that
  * [[graft.analytics.CorpusQueries.d7BloomDecontam]]'s portable SQL twin
  * expresses with `substring` over a '0'/'1' string: the bitmap here is
  * 8× smaller (packed bits, `m/8` bytes shipped once per stage as a
  * codegen reference object, not an 8-bit-per-bit string literal), and
  * the generated code is a k-step loop of shifts and masks inside
  * whole-stage codegen — no string indexing per gram. Position
  * arithmetic is IDENTICAL to the string/SQL formulations, so all three
  * flag exactly the same documents (asserted in BloomProbeSpec).
  */
final case class BloomProbe(
    child: Expression,
    bits: Array[Byte],
    hashA: Array[Long],
    hashB: Array[Long],
    modulus: Long,
    bitCount: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires bigint hash input, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[Long] % modulus
    var j = 0
    while (j < hashA.length) {
      val pos = ((hashA(j) * h + hashB(j)) % bitCount).toInt
      if ((bits(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    val aRef = ctx.addReferenceObj("bloomA", hashA, "long[]")
    val bRef = ctx.addReferenceObj("bloomB", hashB, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val hm = ctx.freshName("hm")
      val j = ctx.freshName("j")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      s"""
         |long $hm = $h % ${modulus}L;
         |boolean $hit = true;
         |for (int $j = 0; $j < $aRef.length; $j++) {
         |  int $pos = (int) (($aRef[$j] * $hm + $bRef[$j]) % ${bitCount}L);
         |  if (($bitsRef[$pos >>> 3] & (1 << ($pos & 7))) == 0) { $hit = false; break; }
         |}
         |${ev.value} = $hit;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {
  /** Pack a set of bit positions into the byte bitmap [[BloomProbe]]
    * expects (little-endian within each byte, matching the probe). */
  def pack(positions: Iterator[Long], bitCount: Int): Array[Byte] = {
    val bytes = new Array[Byte]((bitCount + 7) / 8)
    positions.foreach { p =>
      val i = p.toInt
      bytes(i >>> 3) = (bytes(i >>> 3) | (1 << (i & 7))).toByte
    }
    bytes
  }
}
