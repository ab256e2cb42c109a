package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IP-literal parsing for the GeoIP enrichment path (M4/J1).
  *
  * The reference resolves ANY address literal via `java.net.InetAddress`
  * and feeds its raw bytes to the vendor MMDB reader
  * (mapper/rakam-mapper-geoip-maxmind/.../MaxmindGeoIPEventMapper.java:292-358).
  * This engine mirrors that split Spark-side without a per-row UDF:
  *
  *   - dotted-quad v4, v4-MAPPED v6 (`::ffff:a.b.c.d` — Java parses it
  *     straight to an `Inet4Address`) and v4-COMPATIBLE v6 (`::a.b.c.d`
  *     — the spec's own 96-zero-bit v4 embedding, so the vendor walk
  *     lands in the v4 subtree anyway) all CANONICALIZE to a dotted
  *     quad ([[Ipv4Canonical]]) and probe the v4 range dim;
  *   - every other v6 literal becomes its 16 network-order bytes
  *     ([[Ipv6Bytes]]) and probes the v6 range dim. `BinaryType`
  *     compares byte-wise unsigned, so plain `>=`/`<=` against 16-byte
  *     bounds IS 128-bit unsigned range containment — no 128-bit
  *     arithmetic type needed (Decimal(38,0) cannot even hold 2^128−1).
  *
  * Both expressions are codegen'd wrappers over the static parsers here
  * — one tight function call inside whole-stage codegen, like Spark's
  * own StaticInvoke-backed built-ins.
  */
object IpAddr {

  /** Strict dotted-quad → unsigned 32-bit value, or -1 when not one
    * (four groups of 1-3 decimal digits, each ≤ 255; leading zeros
    * allowed and read as decimal). */
  def v4Num(s: String): Long = {
    var acc = 0L
    var part = 0L
    var digits = 0
    var dots = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        digits += 1
        if (digits > 3) return -1L
        part = part * 10 + (c - '0')
        if (part > 255) return -1L
      } else if (c == '.') {
        if (digits == 0) return -1L
        dots += 1
        if (dots > 3) return -1L
        acc = (acc << 8) | part
        part = 0
        digits = 0
      } else return -1L
      i += 1
    }
    if (dots != 3 || digits == 0) -1L
    else (acc << 8) | part
  }

  /** RFC 4291 §2.2 IPv6 literal (full, `::`-compressed, optional
    * trailing dotted quad as the final 32 bits) → 16 network-order
    * bytes; null on anything else — including plain dotted-quad v4,
    * zone-id suffixes (`%eth0`) and out-of-range groups. */
  def parse16(s: String): Array[Byte] = {
    if (s == null || s.length < 2 || s.indexOf(':') < 0 ||
      s.indexOf('%') >= 0) return null
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null // one "::" max

    // a dotted-quad tail is only legal as the literal's FINAL segment
    def parseGroups(part: String, v4TailOk: Boolean): Array[Int] = {
      if (part.isEmpty) return Array.emptyIntArray
      val segs = part.split(":", -1)
      val out = new Array[Int](segs.length + 1) // +1 in case of v4 tail
      var k = 0
      var i = 0
      while (i < segs.length) {
        val g = segs(i)
        if (g.isEmpty) return null
        if (g.indexOf('.') >= 0) {
          if (!v4TailOk || i != segs.length - 1) return null
          val v4 = v4Num(g)
          if (v4 < 0) return null
          out(k) = ((v4 >>> 16) & 0xFFFF).toInt
          out(k + 1) = (v4 & 0xFFFF).toInt
          k += 2
        } else {
          if (g.length > 4) return null
          var v = 0
          var j = 0
          while (j < g.length) {
            val c = g.charAt(j)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else return null
            v = (v << 4) | d
            j += 1
          }
          out(k) = v
          k += 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(out, k)
    }

    // in a "::" literal the left part is never the address tail, so a
    // dotted quad there ("1.2.3.4::") can't be the final 32 bits
    val left = parseGroups(
      if (dc < 0) s else s.substring(0, dc), v4TailOk = dc < 0)
    if (left == null) return null
    val right =
      if (dc < 0) Array.emptyIntArray
      else parseGroups(s.substring(dc + 2), v4TailOk = true)
    if (right == null) return null
    val total = left.length + right.length
    // "::" stands for AT LEAST one zero group
    if (dc < 0 && total != 8) return null
    if (dc >= 0 && total > 7) return null
    val full = new Array[Int](8)
    var i = 0
    while (i < left.length) { full(i) = left(i); i += 1 }
    var j = 0
    while (j < right.length) {
      full(8 - right.length + j) = right(j)
      j += 1
    }
    val out = new Array[Byte](16)
    i = 0
    while (i < 8) {
      out(2 * i) = ((full(i) >>> 8) & 0xFF).toByte
      out(2 * i + 1) = (full(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** The embedded v4 of a v4-MAPPED (bytes 0-9 zero, 10-11 = 0xFFFF)
    * or v4-COMPATIBLE (bytes 0-11 zero) 16-byte address, else -1. */
  def embeddedV4Num(b: Array[Byte]): Long = {
    var i = 0
    while (i < 10) {
      if (b(i) != 0) return -1L
      i += 1
    }
    val mapped = b(10) == -1 && b(11) == -1
    val compat = b(10) == 0 && b(11) == 0
    if (!mapped && !compat) return -1L
    ((b(12) & 0xFFL) << 24) | ((b(13) & 0xFFL) << 16) |
      ((b(14) & 0xFFL) << 8) | (b(15) & 0xFFL)
  }

  /** Any literal a v4 walk can serve → its unsigned 32-bit value:
    * dotted quad directly, v4-mapped/compatible v6 via the embedding;
    * -1 otherwise. */
  def v4NumOrEmbedded(s: String): Long = {
    val direct = v4Num(s)
    if (direct >= 0) return direct
    val b = parse16(s)
    if (b == null) -1L else embeddedV4Num(b)
  }

  private def dotted(v: Long): String =
    s"${(v >>> 24) & 255}.${(v >>> 16) & 255}.${(v >>> 8) & 255}.${v & 255}"

  // ---- UTF8String-facing statics the generated code calls ----

  /** 16-byte key for a v6 literal that is NOT v4-representable; null
    * for dotted quads, v4-mapped/compatible forms (those take the v4
    * path) and unparseable input. */
  def ipv6Bytes(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val b = parse16(s.toString)
    if (b == null || embeddedV4Num(b) >= 0) null else b
  }

  /** Canonical dotted quad for any v4-representable literal (dotted
    * quad — normalized, so `010.0.0.1` reads as decimal 10 and the
    * private-range regex sees it — v4-mapped v6, v4-compatible v6);
    * null otherwise. */
  def ipv4Canonical(s: UTF8String): UTF8String = {
    if (s == null) return null
    val v = v4NumOrEmbedded(s.toString)
    if (v < 0) null else UTF8String.fromString(dotted(v))
  }
}

/** `ipv6_bytes(ip)` — see [[IpAddr.ipv6Bytes]]. */
final case class Ipv6Bytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    IpAddr.ipv6Bytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.IpAddr.ipv6Bytes($c);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ipv4_canonical(ip)` — see [[IpAddr.ipv4Canonical]]. */
final case class Ipv4Canonical(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    IpAddr.ipv4Canonical(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.IpAddr.ipv4Canonical($c);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
