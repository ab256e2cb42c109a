package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The IP-literal parsers against `java.net.InetAddress` as the
  * independent oracle (the parser the REFERENCE delegates to), plus the
  * codegen contract of the two wrapper expressions. Oracle calls only
  * ever see syntactically valid literals — `getByName` on a non-literal
  * would attempt a (sandboxed, offline) DNS resolution. */
class IpAddrSpec extends SparkSpec {

  private val validV6 = Seq(
    "2001:db8::1",
    "2001:0db8:0000:0000:0000:0000:0000:0001",
    "2001:db8:1:2:3:4:5:6",
    "fe80::",
    "::",
    "::1",
    "1:2:3:4:5:6:7:8",
    "1:2:3:4:5:6:7::",
    "::2:3:4:5:6:7:8",
    "2400:cb00:2048:1::6810:135e",
    "::ffff:1.2.3.4",
    "::1.2.3.4",
    "2001:db8::192.168.0.1",
    "ABCD:EF01:2345:6789:abcd:ef01:2345:6789")

  private val invalid = Seq(
    "", ":", ":::", "1:2:3", "1:2:3:4:5:6:7:8:9", "1:2:3:4:5:6:7:8::",
    "12345::", "g::1", "1.2.3.4::5", "1.2.3.4::", "::ffff:1.2.3.400",
    "::ffff:1.2.3", "fe80::1%eth0", "1::2::3", "not-an-ip", "1.2.3.4",
    "2001:db8::1.2.3.4:5")

  test("parse16 == InetAddress bytes for every valid v6 form") {
    for (s <- validV6) {
      val mine = IpAddr.parse16(s)
      assert(mine != null, s)
      val oracle = java.net.InetAddress.getByName(s).getAddress
      if (oracle.length == 16) {
        assert(mine.toSeq === oracle.toSeq, s)
      } else {
        // Java collapses v4-mapped literals to Inet4Address — the
        // embedded-v4 reading must agree with those 4 bytes
        val emb = IpAddr.embeddedV4Num(mine)
        assert(emb >= 0, s)
        val javaNum = oracle.map(_ & 0xFFL).reduce((a, b) => (a << 8) | b)
        assert(emb === javaNum, s)
      }
    }
  }

  test("invalid literals parse to null (and never throw)") {
    for (s <- invalid) assert(IpAddr.parse16(s) === null, s)
  }

  test("v4Num: strict dotted-quad semantics") {
    assert(IpAddr.v4Num("1.2.3.4") === 0x01020304L)
    assert(IpAddr.v4Num("255.255.255.255") === 0xFFFFFFFFL)
    assert(IpAddr.v4Num("0.0.0.0") === 0L)
    assert(IpAddr.v4Num("010.0.0.1") === 0x0A000001L) // decimal, normalized
    for (bad <- Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "1..2.3", "1.2.3.4 ",
        "a.b.c.d", "1.2.3.1234", "")) {
      assert(IpAddr.v4Num(bad) === -1L, bad)
    }
  }

  test("ipv4Canonical routes exactly the v4-representable forms") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(IpAddr.ipv4Canonical(u("1.2.3.4")).toString === "1.2.3.4")
    assert(IpAddr.ipv4Canonical(u("010.0.0.1")).toString === "10.0.0.1")
    assert(IpAddr.ipv4Canonical(u("::ffff:1.2.3.4")).toString === "1.2.3.4")
    assert(IpAddr.ipv4Canonical(u("::1.2.3.4")).toString === "1.2.3.4")
    assert(IpAddr.ipv4Canonical(u("::1")).toString === "0.0.0.1")
    assert(IpAddr.ipv4Canonical(u("2001:db8::1")) === null)
    assert(IpAddr.ipv4Canonical(u("2001:db8::1.2.3.4")) === null)
    assert(IpAddr.ipv4Canonical(u("nope")) === null)
  }

  test("ipv6Bytes null-s every v4-representable or invalid form") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(IpAddr.ipv6Bytes(u("1.2.3.4")) === null)
    assert(IpAddr.ipv6Bytes(u("::ffff:1.2.3.4")) === null)
    assert(IpAddr.ipv6Bytes(u("::1.2.3.4")) === null)
    assert(IpAddr.ipv6Bytes(u("nope")) === null)
    val b = IpAddr.ipv6Bytes(u("2001:db8::1"))
    assert(b != null && b.length === 16)
    assert((b(0) & 0xFF) === 0x20 && (b(15) & 0xFF) === 0x01)
  }

  test("the SQL wrappers evaluate inside whole-stage codegen") {
    import spark.implicits._
    val df = Seq("2001:db8::1", "::ffff:1.2.3.4", "1.2.3.4", "garbage")
      .toDF("ip")
      .selectExpr("ip", "ipv6_bytes(ip) AS b6", "ipv4_canonical(ip) AS c4")
    val warns = capturingCodegenFallback {
      val rows = df.collect().map(r =>
        (r.getString(0), Option(r.getAs[Array[Byte]]("b6")).map(_.length),
          r.getAs[String]("c4"))).toSeq
      assert(rows === Seq(
        ("2001:db8::1", Some(16), null),
        ("::ffff:1.2.3.4", None, "1.2.3.4"),
        ("1.2.3.4", None, "1.2.3.4"),
        ("garbage", None, null)))
    }
    assert(warns.isEmpty, s"codegen fell back: $warns")
  }

  test("randomized literal forms: parse16 == InetAddress, 500 rounds") {
    // seeded generator emitting VALID literals across the grammar:
    // full form, ::-compression at a random split, mixed case, group
    // widths 1-4, optional v4 tail — then byte-for-byte Java parity
    val rnd = new scala.util.Random(20260815L)
    def hexGroup(): String = {
      val v = rnd.nextInt(0x10000)
      val s = Integer.toHexString(v)
      if (rnd.nextBoolean()) s.toUpperCase else s
    }
    (0 until 500).foreach { i =>
      val v4Tail = rnd.nextInt(4) == 0
      val tailGroups = if (v4Tail) 2 else 0
      val compress = rnd.nextBoolean()
      val lit =
        if (!compress) {
          val hexN = 8 - tailGroups
          val hex = Seq.fill(hexN)(hexGroup())
          val all = if (v4Tail)
            hex :+ s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
          else hex
          all.mkString(":")
        } else {
          // left + :: + right, total groups ≤ 7 (:: covers ≥ 1)
          val total = rnd.nextInt(7 - tailGroups + 1) // 0..7-tail
          val nLeft = rnd.nextInt(total + 1)
          val nRight = total - nLeft
          val left = Seq.fill(nLeft)(hexGroup()).mkString(":")
          val rightHex = Seq.fill(nRight)(hexGroup())
          val right = (if (v4Tail)
            rightHex :+ s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
          else rightHex).mkString(":")
          s"$left::$right"
        }
      val mine = IpAddr.parse16(lit)
      assert(mine != null, s"round $i rejected valid literal: $lit")
      val oracle = java.net.InetAddress.getByName(lit).getAddress
      if (oracle.length == 16) assert(mine.toSeq === oracle.toSeq, lit)
      else {
        val emb = IpAddr.embeddedV4Num(mine)
        val javaNum = oracle.map(_ & 0xFFL).reduce((a, b) => (a << 8) | b)
        assert(emb === javaNum, lit)
      }
    }
  }

  test("binary range containment via >=/<= is 128-bit unsigned") {
    import spark.implicits._
    // 0x80... > 0x7f... must hold under the BinaryType ordering — the
    // property the whole v6 join design rests on
    val hi = IpAddr.parse16("8000::")
    val lo = IpAddr.parse16("7fff:ffff:ffff:ffff:ffff:ffff:ffff:ffff")
    val out = Seq((hi, lo)).toDF("a", "b").selectExpr("a > b").as[Boolean]
    assert(out.collect().toSeq === Seq(true))
  }
}
