package graft.enrich.geo

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** From-scratch reader for the MaxMind DB ("MMDB") binary format — the
  * file format every real GeoIP deployment ships its data in. Written
  * against the PUBLIC MaxMind DB File Format Specification v2.0 (the
  * three sections: binary search tree of fixed-width records, data
  * section in the type-tagged control-byte encoding, metadata map
  * after the `\xAB\xCD\xEFMaxMind.com` marker).
  *
  * The reference mapper opens the customer's `.mmdb` and resolves
  * per-event via the vendor reader
  * (mapper/rakam-mapper-geoip-maxmind/src/main/java/org/rakam/collection/mapper/geoip/maxmind/MaxmindGeoIPEventMapper.java:166-222,292-358).
  * This engine keeps per-row resolution OUT of the row path: the
  * search tree is a prefix trie over IP space, i.e. exactly a sorted
  * list of disjoint [lo, hi] ranges, so [[rangeDim]] enumerates it
  * ONCE into the broadcast range dim that [[graft.enrich.GeoIpMapper]]
  * already joins — the scan stays codegen'd and shuffle-free, and the
  * dim is a few hundred MB broadcast at full GeoIP2-City size. The
  * per-IP [[lookup]] walk exists for point probes and as the
  * equivalence oracle the spec pins the enumeration against.
  */
final class MaxmindDb private (buf: Array[Byte],
    val metadata: MaxmindDb.Metadata, dataBase: Int) extends Serializable {
  import MaxmindDb._

  private val nodeBytes = metadata.recordSize * 2 / 8
  private val treeSize = metadata.nodeCount.toLong * nodeBytes

  /** One search-tree record: the `side` (0 = left/bit 0, 1 = right)
    * pointer of node `n` — a node index, the no-data sentinel
    * (== node_count), or a data-section pointer (> node_count). */
  private def record(n: Int, side: Int): Int = {
    val base = n * nodeBytes
    def b(i: Int): Int = buf(base + i) & 0xFF
    metadata.recordSize match {
      case 24 =>
        val o = side * 3
        (b(o) << 16) | (b(o + 1) << 8) | b(o + 2)
      case 28 =>
        if (side == 0) ((b(3) >>> 4) << 24) | (b(0) << 16) | (b(1) << 8) | b(2)
        else ((b(3) & 0xF) << 24) | (b(4) << 16) | (b(5) << 8) | b(6)
      case 32 =>
        val o = side * 4
        (b(o) << 24) | (b(o + 1) << 16) | (b(o + 2) << 8) | b(o + 3)
      case rs => throw new MmdbFormatException(s"unsupported record_size $rs")
    }
  }

  private def decodeData(recordValue: Int): Any =
    new Decoder(buf, dataBase)
      .decode(treeSize.toInt + (recordValue - metadata.nodeCount))._1

  /** The node where IPv4 space starts: node 0 for an ip_version-4
    * database; after 96 zero bits (the ::a.b.c.d embedding the spec
    * prescribes for v4 lookups) in an ip_version-6 tree. -1 = the v6
    * tree maps some /96-or-shorter prefix over all of v4 (data or
    * not-found before depth 96 — degenerate but representable). */
  private lazy val v4Root: Int = {
    var node = 0
    var depth = 0
    while (depth < 96 && node < metadata.nodeCount) {
      node = record(node, 0)
      depth += 1
    }
    if (node < metadata.nodeCount) node else -1
  }

  /** Point lookup of a dotted-quad IPv4 address: walk one bit per tree
    * level. Returns the decoded data-section value (a Map for every
    * real database) or None when the address hits the no-data record. */
  def lookup(ip: String): Option[Any] = {
    val ipNum = ipv4ToLong(ip).getOrElse(
      throw new MmdbFormatException(s"not a dotted-quad IPv4 address: $ip"))
    var node = if (metadata.ipVersion == 6) v4Root else 0
    if (node < 0) return None
    var bit = 31
    while (bit >= 0) {
      val rec = record(node, ((ipNum >> bit) & 1L).toInt)
      if (rec == metadata.nodeCount) return None
      if (rec > metadata.nodeCount) return Some(decodeData(rec))
      node = rec
      bit -= 1
    }
    None
  }

  /** Enumerate the IPv4 search tree as disjoint, sorted ranges —
    * (ip_lo, ip_hi, decoded data) — by depth-first walk. The trie IS
    * this range list; enumeration is O(|networks|) and each data
    * record decodes once per tree reference. */
  def networks(): Seq[(Long, Long, Any)] = {
    val out = Seq.newBuilder[(Long, Long, Any)]
    def walk(node: Int, prefix: Long, depth: Int): Unit = {
      if (depth > 32) throw new MmdbFormatException(
        "IPv4 search tree deeper than 32 bits")
      var side = 0
      while (side <= 1) {
        val rec = record(node, side)
        val p = (prefix << 1) | side
        if (rec < metadata.nodeCount) walk(rec, p, depth + 1)
        else if (rec > metadata.nodeCount) {
          val lo = p << (32 - depth - 1)
          val hi = lo + ((1L << (32 - depth - 1)) - 1)
          out += ((lo, hi, decodeData(rec)))
        }
        side += 1
      }
    }
    val root = if (metadata.ipVersion == 6) v4Root else 0
    if (root >= 0) walk(root, 0L, 0)
    out.result()
  }

  /** The broadcast range dim for [[graft.enrich.GeoIpMapper]]:
    * `(ip_lo, ip_hi)` plus the flattened MaxMind attribute set — the
    * same columns the reference mapper copies out of the vendor
    * responses (MaxmindGeoIPEventMapper.java:280-353): city DB →
    * `_country_code,_region,_city,_latitude,_longitude,_timezone`;
    * ISP / connection-type DBs → `_isp` / `_connection_type` (read
    * from `traits` or the standalone-database top level). Columns
    * that no network populates are dropped, so a city-only file
    * enriches the city subset — the reference's optional-database
    * behavior. */
  def rangeDim(spark: SparkSession): DataFrame = {
    val nets = networks()
    val rows = nets.map { case (lo, hi, data) =>
      val m = data match {
        case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      (lo, hi, flatten(m))
    }
    val present = Attrs.filter { case (name, _) =>
      rows.exists(_._3(name) != null)
    }
    val schema = StructType(
      StructField("ip_lo", LongType, nullable = false) +:
      StructField("ip_hi", LongType, nullable = false) +:
      present.map { case (name, tpe) => StructField(name, tpe, nullable = true) })
    val data = rows.map { case (lo, hi, attrs) =>
      Row.fromSeq(lo +: hi +: present.map { case (name, _) => attrs(name) })
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(data.asJava, schema)
  }
}

object MaxmindDb {

  final class MmdbFormatException(msg: String) extends RuntimeException(msg)

  /** The subset of the metadata map the reader needs, plus identity. */
  final case class Metadata(nodeCount: Int, recordSize: Int, ipVersion: Int,
      databaseType: String, majorVersion: Int, buildEpoch: Long)

  private val Marker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes(UTF_8)

  /** The flattened attribute columns and their Spark types, in dim
    * order (MaxmindGeoIPEventMapper.java:280-353's attribute set). */
  private val Attrs: Seq[(String, DataType)] = Seq(
    "_country_code" -> StringType, "_region" -> StringType,
    "_city" -> StringType, "_latitude" -> DoubleType,
    "_longitude" -> DoubleType, "_timezone" -> StringType,
    "_isp" -> StringType, "_connection_type" -> StringType)

  private def str(v: Any): String = v match {
    case s: String => s; case _ => null
  }
  private def dbl(v: Any): java.lang.Double = v match {
    case d: Double => d; case f: Float => f.toDouble
    case l: Long => l.toDouble; case i: Int => i.toDouble; case _ => null
  }
  private def sub(m: Map[String, Any], key: String): Map[String, Any] =
    m.get(key) match {
      case Some(mm: Map[_, _]) => mm.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }

  /** GeoIP2 record → flat attribute map (missing → null). */
  private def flatten(m: Map[String, Any]): Map[String, Any] = {
    val country = sub(m, "country")
    val city = sub(m, "city")
    val location = sub(m, "location")
    val traits = sub(m, "traits")
    val region = m.get("subdivisions") match {
      case Some(s: Seq[_]) => s.headOption match {
        case Some(sd: Map[_, _]) =>
          str(sd.asInstanceOf[Map[String, Any]].getOrElse("iso_code", null))
        case _ => null
      }
      case _ => null
    }
    Map(
      "_country_code" -> str(country.getOrElse("iso_code", null)),
      "_region" -> region,
      "_city" -> str(sub(city, "names").getOrElse("en", null)),
      "_latitude" -> dbl(location.getOrElse("latitude", null)),
      "_longitude" -> dbl(location.getOrElse("longitude", null)),
      "_timezone" -> str(location.getOrElse("time_zone", null)),
      "_isp" -> str(traits.getOrElse("isp", m.getOrElse("isp", null))),
      "_connection_type" -> str(traits.getOrElse("connection_type",
        m.getOrElse("connection_type", null))))
  }

  private[geo] def ipv4ToLong(ip: String): Option[Long] = {
    val parts = ip.split("\\.", -1)
    if (parts.length != 4) return None
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(c => c >= '0' && c <= '9'))
        return None
      val v = p.toInt
      if (v > 255) return None
      acc = (acc << 8) | v
      i += 1
    }
    Some(acc)
  }

  def readFile(path: String): MaxmindDb =
    read(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** The one-call integration the reference configures as
    * `plugin.geoip.database.url`: a customer `.mmdb` file becomes the
    * broadcast-range-join mapper directly. */
  def geoIpMapper(spark: SparkSession, path: String): graft.enrich.GeoIpMapper =
    graft.enrich.GeoIpMapper(readFile(path).rangeDim(spark))

  def read(buf: Array[Byte]): MaxmindDb = {
    // the metadata map follows the LAST marker occurrence (the spec
    // caps metadata at 128 KiB; scanning the tail suffices, but a full
    // backward scan is simplest and the file is read once)
    var at = buf.length - Marker.length
    var found = -1
    while (at >= 0 && found < 0) {
      var i = 0
      while (i < Marker.length && buf(at + i) == Marker(i)) i += 1
      if (i == Marker.length) found = at else at -= 1
    }
    if (found < 0) throw new MmdbFormatException("no MaxMind.com metadata marker")
    val metaStart = found + Marker.length
    val meta = new Decoder(buf, metaStart).decode(metaStart)._1 match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new MmdbFormatException(
        s"metadata is not a map: ${other.getClass.getSimpleName}")
    }
    def metaInt(k: String): Int = meta.get(k) match {
      case Some(l: Long) => l.toInt
      case Some(i: Int) => i
      case _ => throw new MmdbFormatException(s"metadata missing $k")
    }
    val md = Metadata(
      nodeCount = metaInt("node_count"),
      recordSize = metaInt("record_size"),
      ipVersion = metaInt("ip_version"),
      databaseType = meta.get("database_type").map(_.toString).getOrElse(""),
      majorVersion = metaInt("binary_format_major_version"),
      buildEpoch = meta.get("build_epoch") match {
        case Some(l: Long) => l; case _ => 0L
      })
    if (md.majorVersion != 2)
      throw new MmdbFormatException(
        s"unsupported binary format major version ${md.majorVersion}")
    if (md.recordSize != 24 && md.recordSize != 28 && md.recordSize != 32)
      throw new MmdbFormatException(s"unsupported record_size ${md.recordSize}")
    val dataBase = md.nodeCount * (md.recordSize * 2 / 8) + 16
    if (dataBase > buf.length)
      throw new MmdbFormatException("search tree extends past end of file")
    new MaxmindDb(buf, md, dataBase)
  }

  /** Data-section decoder: the control-byte encoding (spec §"Data
    * Section"). `base` is the offset pointers are relative to — the
    * data section start for the data section, the map start for the
    * metadata section. Returns (value, offset-after-value). */
  private final class Decoder(buf: Array[Byte], base: Int) {
    private def ub(i: Int): Int = buf(i) & 0xFF

    def decode(offset: Int): (Any, Int) = {
      val ctrl = ub(offset)
      var typ = ctrl >>> 5
      var size = ctrl & 0x1F
      var p = offset + 1
      if (typ == 0) { typ = ub(p) + 7; p += 1 } // extended type
      if (typ == 1) {
        // pointer: bits 3-4 of size = pointer byte width - 1,
        // bits 0-2 prepend to the value; widths 2-4 add fixed bias
        val ss = (size >>> 3) & 0x3
        val v = size & 0x7
        val target = ss match {
          case 0 => (v << 8) | ub(p)
          case 1 => ((v << 16) | (ub(p) << 8) | ub(p + 1)) + 2048
          case 2 => ((v << 24) | (ub(p) << 16) | (ub(p + 1) << 8) | ub(p + 2)) + 526336
          case _ => (ub(p).toLong << 24 | ub(p + 1) << 16 | ub(p + 2) << 8 | ub(p + 3)).toInt
        }
        val next = p + ss + 1
        return (new Decoder(buf, base).decode(base + target)._1, next)
      }
      if (size == 29) { size = 29 + ub(p); p += 1 }
      else if (size == 30) { size = 285 + (ub(p) << 8) + ub(p + 1); p += 2 }
      else if (size == 31) {
        size = 65821 + (ub(p) << 16) + (ub(p + 1) << 8) + ub(p + 2); p += 3
      }
      typ match {
        case 2 => (new String(buf, p, size, UTF_8), p + size)
        case 3 =>
          if (size != 8) throw new MmdbFormatException(s"double of size $size")
          (java.lang.Double.longBitsToDouble(be(p, 8)), p + 8)
        case 4 => (java.util.Arrays.copyOfRange(buf, p, p + size), p + size)
        case 5 | 6 | 9 =>
          if (size > 8) throw new MmdbFormatException(s"uint of size $size")
          (be(p, size), p + size)
        case 10 =>
          (BigInt(1, java.util.Arrays.copyOfRange(buf, p, p + size)), p + size)
        case 7 =>
          var m = Map.empty[String, Any]
          var o = p
          var i = 0
          while (i < size) {
            val (k, o1) = decode(o)
            val (v, o2) = decode(o1)
            m = m.updated(k match {
              case s: String => s
              case other => throw new MmdbFormatException(
                s"map key is not a string: ${other.getClass.getSimpleName}")
            }, v)
            o = o2
            i += 1
          }
          (m, o)
        case 11 =>
          val items = Seq.newBuilder[Any]
          var o = p
          var i = 0
          while (i < size) {
            val (v, o1) = decode(o); items += v; o = o1; i += 1
          }
          (items.result(), o)
        case 8 =>
          // int32: big-endian, ≤ 4 bytes (shorter encodings are
          // non-negative by construction)
          if (size > 4) throw new MmdbFormatException(s"int32 of size $size")
          val raw = be(p, size)
          val v = if (size == 4) raw.toInt.toLong else raw
          (v, p + size)
        case 14 => (size != 0, p) // boolean rides in the size field
        case 15 =>
          if (size != 4) throw new MmdbFormatException(s"float of size $size")
          (java.lang.Float.intBitsToFloat(be(p, 4).toInt), p + 4)
        case t => throw new MmdbFormatException(s"unsupported data type $t")
      }
    }

    private def be(p: Int, n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc << 8) | ub(p + i); i += 1 }
      acc
    }
  }
}
