package graft.enrich.geo

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection

/** Measures the broadcast payload of a GeoIP range dim so SCALE.md's
  * "a full GeoIP2-City family dim is a few hundred MB: broadcastable"
  * claim is load-bearing, not aspirational.
  *
  * Method: enumerate a DENSE generated v6 database (every network a
  * full city+ISP record, city names all distinct — conservative versus
  * real files, whose pointer dedup shares most records) into
  * `rangeDim6`, materialize each row through the same UnsafeRow layout
  * a broadcast exchange ships, and extrapolate bytes/row to the public
  * GeoLite2-City scale (~4M networks per family — the paid GeoIP2-City
  * is the same order). The assertion pins the extrapolation under the
  * comfort line for 16g executors; if a future attribute widens rows
  * past it, this spec — not a production OOM — is what fails.
  *
  * Fallback above the line (documented in SCALE.md): shard the dim by
  * leading-byte bin and re-key probes, the j9 BinnedIntervalJoinRule
  * pattern, instead of broadcasting.
  */
class RangeDimSizeSpec extends SparkSpec {

  private val N = 4096
  /** GeoLite2-City order of magnitude, networks per address family. */
  private val RealScaleNetworks = 4000000L
  private val ComfortBytes = 1500L * 1024 * 1024 // 1.5 GiB

  test("rangeDim6 broadcast payload extrapolates under the 16g comfort line") {
    val tzs = Seq("Europe/Berlin", "America/Los_Angeles", "Asia/Tokyo",
      "Australia/Sydney", "America/Sao_Paulo")
    val isps = Seq("Deutsche Telekom", "Comcast Cable", "NTT Communications",
      "Telstra Internet", "Claro Brasil")
    val entries = (0 until N).map { i =>
      f"2001:${(i >> 8) + 1}%x:${i & 0xff}%x::/48" -> Map(
        "country" -> Map("iso_code" -> f"C${i % 97}%02d"),
        "subdivisions" -> Seq(Map("iso_code" -> f"S${i % 53}%02d")),
        // distinct city string per network: defeats pointer dedup so
        // bytes/row is measured WITHOUT record sharing (conservative)
        "city" -> Map("names" -> Map("en" -> f"Metropolis District $i%05d")),
        "location" -> Map("latitude" -> (i % 180 - 90.0),
          "longitude" -> (i % 360 - 180.0), "time_zone" -> tzs(i % tzs.size)),
        "traits" -> Map("isp" -> isps(i % isps.size),
          "connection_type" -> (if (i % 2 == 0) "Cable/DSL" else "Cellular")))
    }
    val db = MaxmindDb.read(MmdbFixture.write(entries, ipVersion = 6,
      dedupe = false))
    val dim = db.rangeDim6(spark)
    assert(dim.count() === N.toLong) // disjoint networks never split

    val schema = dim.schema
    val bytes = dim.queryExecution.toRdd.mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      Iterator.single(it.map(r => proj(r).getSizeInBytes.toLong).sum)
    }.collect().sum
    val perRow = bytes.toDouble / N
    val extrapolated = (perRow * RealScaleNetworks).toLong
    info(f"rangeDim6: $perRow%.1f B/row unsafe, " +
      f"${extrapolated / (1024.0 * 1024)}%.0f MB at $RealScaleNetworks networks")
    // a 16-byte-keyed city+ISP row lands around 200 B; leave headroom
    // for layout drift but fail well before broadcast pain
    assert(extrapolated <= ComfortBytes,
      f"extrapolated dim ${extrapolated / (1024.0 * 1024)}%.0f MB exceeds " +
        f"the ${ComfortBytes / (1024 * 1024)} MB comfort line " +
        f"($perRow%.1f B/row x $RealScaleNetworks networks) - time to bin-" +
        "shard the dim (BinnedIntervalJoinRule pattern) instead of broadcasting")
  }
}
