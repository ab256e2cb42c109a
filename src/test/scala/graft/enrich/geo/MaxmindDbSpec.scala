package graft.enrich.geo

import graft.SparkSpec
import graft.enrich.{GeoIpMapper, MapperPipeline, XffIpMapper}
import org.apache.spark.sql.functions._

/** J1/M4 fidelity: the from-scratch MMDB reader against generated
  * fixture files (spec v2.0) — metadata, search-tree walk at every
  * record width, data-section types incl. pointers, v4-in-v6
  * embedding, and the contract that matters to the engine: the
  * enumerated range dim drives [[GeoIpMapper]] to the same result as
  * per-IP [[MaxmindDb.lookup]] walks. */
class MaxmindDbSpec extends SparkSpec {

  /** The m4 oracle's three /24s as GeoIP2-shaped records. */
  private def cityEntries: Seq[(String, Map[String, Any])] = Seq(
    "1.0.0.0/24" -> Map(
      "country" -> Map("iso_code" -> "AU"),
      "city" -> Map("names" -> Map("en" -> "Sydney")),
      "subdivisions" -> Seq(Map("iso_code" -> "NSW")),
      "location" -> Map("latitude" -> -33.86, "longitude" -> 151.2,
        "time_zone" -> "Australia/Sydney"),
      "traits" -> Map("isp" -> "Telstra", "connection_type" -> "Cable/DSL")),
    "1.0.1.0/24" -> Map(
      "country" -> Map("iso_code" -> "US"),
      "city" -> Map("names" -> Map("en" -> "New York")),
      "subdivisions" -> Seq(Map("iso_code" -> "NY")),
      "location" -> Map("latitude" -> 40.71, "longitude" -> -74.0,
        "time_zone" -> "America/New_York"),
      "traits" -> Map("isp" -> "Comcast", "connection_type" -> "Corporate")),
    "1.0.2.0/23" -> Map(
      "country" -> Map("iso_code" -> "DE"),
      "city" -> Map("names" -> Map("en" -> "Berlin")),
      "subdivisions" -> Seq(Map("iso_code" -> "BE")),
      "location" -> Map("latitude" -> 52.52, "longitude" -> 13.40,
        "time_zone" -> "Europe/Berlin"),
      // same ISP record as AU — dedupe makes this a type-1 pointer
      "traits" -> Map("isp" -> "Telstra", "connection_type" -> "Cable/DSL")))

  test("metadata parses; lookup walks the tree; misses return None") {
    val db = MaxmindDb.read(MmdbFixture.write(cityEntries))
    assert(db.metadata.recordSize === 24)
    assert(db.metadata.ipVersion === 4)
    assert(db.metadata.majorVersion === 2)
    val hit = db.lookup("1.0.0.7").get.asInstanceOf[Map[String, Any]]
    assert(hit("country").asInstanceOf[Map[String, Any]]("iso_code") === "AU")
    val loc = hit("location").asInstanceOf[Map[String, Any]]
    assert(loc("latitude") === -33.86)
    assert(loc("time_zone") === "Australia/Sydney")
    // the /23 covers 1.0.2.0-1.0.3.255
    val de = db.lookup("1.0.3.255").get.asInstanceOf[Map[String, Any]]
    assert(de("country").asInstanceOf[Map[String, Any]]("iso_code") === "DE")
    assert(db.lookup("1.0.4.0") === None)
    assert(db.lookup("9.9.9.9") === None)
    assert(db.lookup("0.255.255.255") === None)
  }

  test("all three record widths and the v4-in-v6 embedding round-trip") {
    for (rs <- Seq(24, 28, 32); ipv <- Seq(4, 6)) {
      val db = MaxmindDb.read(
        MmdbFixture.write(cityEntries, recordSize = rs, ipVersion = ipv))
      assert(db.metadata.recordSize === rs)
      val hit = db.lookup("1.0.1.200").get.asInstanceOf[Map[String, Any]]
      assert(hit("country").asInstanceOf[Map[String, Any]]("iso_code") === "US",
        s"rs=$rs ipv=$ipv")
      assert(db.lookup("2.0.0.1") === None, s"rs=$rs ipv=$ipv")
      // enumeration is identical across widths/embeddings
      val nets = db.networks().map { case (lo, hi, _) => (lo, hi) }
      assert(nets === Seq(
        (16777216L, 16777471L), (16777472L, 16777727L),
        (16777728L, 16778239L)), s"rs=$rs ipv=$ipv")
    }
  }

  test("pointer-deduped and pointer-free files decode identically") {
    val a = MaxmindDb.read(MmdbFixture.write(cityEntries, dedupe = true))
    val b = MaxmindDb.read(MmdbFixture.write(cityEntries, dedupe = false))
    // dedupe must actually shrink the file (i.e. pointers are present)
    assert(MmdbFixture.write(cityEntries, dedupe = true).length <
      MmdbFixture.write(cityEntries, dedupe = false).length)
    for (ip <- Seq("1.0.0.1", "1.0.1.1", "1.0.2.1", "1.0.3.1"))
      assert(a.lookup(ip) === b.lookup(ip), ip)
  }

  test("networks() enumeration == per-IP lookup at every boundary") {
    val db = MaxmindDb.read(MmdbFixture.write(cityEntries))
    val nets = db.networks()
    nets.foreach { case (lo, hi, data) =>
      def ip(n: Long) =
        s"${(n >> 24) & 255}.${(n >> 16) & 255}.${(n >> 8) & 255}.${n & 255}"
      assert(db.lookup(ip(lo)) === Some(data))
      assert(db.lookup(ip(hi)) === Some(data))
      assert(db.lookup(ip((lo + hi) / 2)) === Some(data))
      // one past each edge is a different (or no) network
      if (lo > 0) assert(db.lookup(ip(lo - 1)) !== Some(data))
    }
  }

  test("rangeDim drives GeoIpMapper to the lookup-equivalent result") {
    import spark.implicits._
    val db = MaxmindDb.read(MmdbFixture.write(cityEntries))
    val dim = db.rangeDim(spark)
    assert(dim.columns.toSeq === Seq("ip_lo", "ip_hi", "_country_code",
      "_region", "_city", "_latitude", "_longitude", "_timezone", "_isp",
      "_connection_type"))
    val events = Seq(
      (1L, "1.0.0.7"), (2L, "1.0.1.200"), (3L, "1.0.2.9"), (4L, "1.0.3.9"),
      (5L, "8.8.8.8"), (6L, "192.168.0.1"), (7L, "not-an-ip"))
      .toDF("event_id", "_ip")
    val out = MapperPipeline.run(events, Seq(GeoIpMapper(dim)))
      .select($"event_id", $"_country_code", $"_city", $"_timezone", $"_isp")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(out(1L) === (("AU", "Sydney", "Australia/Sydney", "Telstra")))
    assert(out(2L) === (("US", "New York", "America/New_York", "Comcast")))
    assert(out(3L) === (("DE", "Berlin", "Europe/Berlin", "Telstra")))
    assert(out(4L) === (("DE", "Berlin", "Europe/Berlin", "Telstra")))
    assert(out(5L) === ((null, null, null, null)))   // unmapped public
    assert(out(6L) === ((null, null, null, null)))   // private, skipped
    assert(out(7L) === ((null, null, null, null)))   // unparseable
    // and the join agrees with the binary-walk oracle row by row
    for ((id, ip) <- Seq((1L, "1.0.0.7"), (2L, "1.0.1.200"), (3L, "1.0.2.9"))) {
      val walked = db.lookup(ip).get.asInstanceOf[Map[String, Any]]
      assert(out(id)._1 ===
        walked("country").asInstanceOf[Map[String, Any]]("iso_code"))
    }
  }

  test("geoIpMapper facade loads a .mmdb file end-to-end") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("graft-geo", ".mmdb")
    java.nio.file.Files.write(f, MmdbFixture.write(cityEntries))
    try {
      val mapper = MaxmindDb.geoIpMapper(spark, f.toString)
      val out = MapperPipeline.run(
        Seq((1L, "10.0.0.1, 1.0.0.7")).toDF("event_id", "_x_forwarded_for"),
        Seq(XffIpMapper, mapper))
      assert(out.select($"_country_code").as[String].collect().toSeq === Seq("AU"))
    } finally java.nio.file.Files.delete(f)
  }

  test("a city-only database yields a dim without isp columns") {
    val cityOnly = cityEntries.map { case (cidr, rec) => cidr -> (rec - "traits") }
    val dim = MaxmindDb.read(MmdbFixture.write(cityOnly)).rangeDim(spark)
    assert(!dim.columns.contains("_isp"))
    assert(!dim.columns.contains("_connection_type"))
    assert(dim.columns.contains("_country_code"))
  }

  /** v6 networks + the m4 v4 /24s in ONE ip_version-6 file — the shape
    * of a real dual-stack GeoIP2 database. */
  private def dualStackEntries: Seq[(String, Map[String, Any])] =
    cityEntries.take(2) ++ Seq(
      "2001:db8::/32" -> Map(
        "country" -> Map("iso_code" -> "JP"),
        "city" -> Map("names" -> Map("en" -> "Tokyo")),
        "location" -> Map("latitude" -> 35.68, "longitude" -> 139.69,
          "time_zone" -> "Asia/Tokyo"),
        "traits" -> Map("isp" -> "NTT", "connection_type" -> "Cable/DSL")),
      "2400:cb00::/32" -> Map(
        "country" -> Map("iso_code" -> "US"),
        "city" -> Map("names" -> Map("en" -> "San Francisco")),
        "location" -> Map("latitude" -> 37.77, "longitude" -> -122.42,
          "time_zone" -> "America/Los_Angeles"),
        // shares the AU isp record via pointer dedup
        "traits" -> Map("isp" -> "Telstra", "connection_type" -> "Cable/DSL")),
      "fd00::/8" -> Map( // unique-local mapped on purpose: the MAPPER must skip it
        "country" -> Map("iso_code" -> "XX"),
        "location" -> Map("time_zone" -> "Etc/UTC")))

  private def fmt16(b: Array[Byte]): String =
    b.grouped(2).map(g => f"${((g(0) & 0xFF) << 8) | (g(1) & 0xFF)}%x")
      .mkString(":")

  test("v6 lookup walks the 128-bit tree; v4 forms redirect to the v4 subtree") {
    val db = MaxmindDb.read(MmdbFixture.write(dualStackEntries, ipVersion = 6))
    def country(ip: String): Any = db.lookup(ip)
      .map(_.asInstanceOf[Map[String, Any]]("country")
        .asInstanceOf[Map[String, Any]]("iso_code")).orNull
    assert(country("2001:db8::1") === "JP")
    assert(country("2001:db8:ffff:ffff:ffff:ffff:ffff:ffff") === "JP")
    assert(country("2001:db9::1") === null)
    assert(country("2400:cb00:2048:1::6810:135e") === "US")
    assert(country("fd12::1") === "XX")
    // v4-representable forms — dotted, mapped, compatible — all hit the
    // v4 subtree records, exactly like InetAddress + the vendor walk
    assert(country("1.0.0.7") === "AU")
    assert(country("::ffff:1.0.0.7") === "AU")
    assert(country("::1.0.0.7") === "AU")
    assert(country("9.9.9.9") === null)
    // a v4-ONLY database cannot resolve a v6 literal (reference: the
    // vendor reader throws; the mapper skips)
    val v4db = MaxmindDb.read(MmdbFixture.write(cityEntries))
    assert(v4db.lookup("2001:db8::1") === None)
    intercept[MaxmindDb.MmdbFormatException](db.lookup("not-an-ip"))
  }

  test("networks6 enumeration == per-IP lookup at every v6 boundary") {
    val db = MaxmindDb.read(MmdbFixture.write(dualStackEntries, ipVersion = 6))
    val nets = db.networks6()
    assert(nets.nonEmpty)
    nets.foreach { case (lo, hi, data) =>
      assert(db.lookup(fmt16(lo)) === Some(data), fmt16(lo))
      assert(db.lookup(fmt16(hi)) === Some(data), fmt16(hi))
    }
    // sorted and disjoint under unsigned byte-wise order
    val flat = nets.map { case (lo, hi, _) =>
      (new java.math.BigInteger(1, lo), new java.math.BigInteger(1, hi)) }
    flat.sliding(2).foreach { pair =>
      if (pair.size == 2) assert(pair(0)._2.compareTo(pair(1)._1) < 0)
    }
    // the default excludes the ::/96 v4 embedding (those probes take
    // the v4 dim); includeV4Embedded restores it
    assert(!nets.exists { case (lo, _, _) => lo.take(12).forall(_ == 0) })
    val full = db.networks6(includeV4Embedded = true)
    assert(full.size === nets.size + db.networks().size)
  }

  test("the ::ffff:0:0/96 v4-mapped alias prunes like ::/96; redirects win") {
    // real MaxMind files alias the v4 tree at BOTH ::/96 and
    // ::ffff:0:0/96; neither is reachable by a probe (those literal
    // forms canonicalize into the v4 dim), so default enumeration
    // drops both. The vendor reader resolves mapped literals through
    // the ::/96 embedding (InetAddress hands it an Inet4Address), so
    // the redirect — not the mapped alias — decides the answer.
    val entries = cityEntries.take(1) ++ Seq(
      "::ffff:1.0.0.0/120" -> Map("country" -> Map("iso_code" -> "ZZ")),
      "2001:db8::/32" -> Map("country" -> Map("iso_code" -> "JP")))
    val db = MaxmindDb.read(MmdbFixture.write(entries, ipVersion = 6))
    val nets = db.networks6()
    assert(nets.size === 1) // only the genuine v6 network
    assert(db.networks6(includeV4Embedded = true).size === 3)
    def cc(ip: String) = db.lookup(ip)
      .map(_.asInstanceOf[Map[String, Any]]("country")
        .asInstanceOf[Map[String, Any]]("iso_code")).orNull
    assert(cc("::ffff:1.0.0.7") === "AU") // the ::/96 embedding, not ZZ
    assert(cc("1.0.0.7") === "AU")
    assert(cc("2001:db8::1") === "JP")
  }

  test("shared data records decode once and are identity-shared") {
    val db = MaxmindDb.read(MmdbFixture.write(dualStackEntries, ipVersion = 6))
    val all = db.networks6(includeV4Embedded = true).map(_._3) ++
      db.networks().map(_._3)
    // AU (v4) and SF (v6) share their traits record via pointer dedup;
    // more to the point, the SAME network looked up twice or enumerated
    // after a lookup must be the SAME object (the decode memo)
    val au1 = db.lookup("1.0.0.7").get
    val au2 = db.networks().find(_._1 === 16777216L).get._3
    assert(au1.asInstanceOf[AnyRef] eq au2.asInstanceOf[AnyRef])
    // distinct records ≤ entries, never per-network copies
    val ids = new java.util.IdentityHashMap[AnyRef, Unit]()
    all.foreach(d => ids.put(d.asInstanceOf[AnyRef], ()))
    assert(ids.size() <= dualStackEntries.size)
    // and the enumeration is lazily streamed — first element without
    // draining the iterator
    val it = db.networks6Iterator()
    assert(it.hasNext)
    assert(it.next()._3 != null)
  }

  test("rangeDim6 + GeoIpMapper enrich v6, redirect v4 forms, skip private") {
    import spark.implicits._
    val db = MaxmindDb.read(MmdbFixture.write(dualStackEntries, ipVersion = 6))
    val mapper = GeoIpMapper(db.rangeDim(spark), Some(db.rangeDim6(spark)))
    val events = Seq(
      (1L, "2001:db8::1"),              // v6 hit
      (2L, "2400:cb00:2048:1::6810:135e"), // v6 hit (deduped record)
      (3L, "::ffff:1.0.0.7"),           // v4-mapped → v4 dim
      (4L, "::1.0.0.7"),                // v4-compatible → v4 dim
      (5L, "1.0.1.200"),                // dotted → v4 dim
      (6L, "fd12::1"),                  // unique-local: SKIPPED even though mapped in the file
      (7L, "fe80::1"),                  // link-local: skipped
      (8L, "2001:db9::1"),              // unmapped public v6
      (9L, "192.168.0.1"),              // private v4
      (10L, "not-an-ip"))
      .toDF("event_id", "_ip")
    val out = MapperPipeline.run(events, Seq(mapper))
      .select($"event_id", $"_country_code", $"_city")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) === (("JP", "Tokyo")))
    assert(out(2L) === (("US", "San Francisco")))
    assert(out(3L) === (("AU", "Sydney")))
    assert(out(4L) === (("AU", "Sydney")))
    assert(out(5L) === (("US", "New York")))
    assert(out(6L) === ((null, null)))
    assert(out(7L) === ((null, null)))
    assert(out(8L) === ((null, null)))
    assert(out(9L) === ((null, null)))
    assert(out(10L) === ((null, null)))
    // and each enrichment agrees with the 128-bit walk
    for ((id, ip) <- Seq((1L, "2001:db8::1"), (3L, "::ffff:1.0.0.7"))) {
      val walked = db.lookup(ip).get.asInstanceOf[Map[String, Any]]
      assert(out(id)._1 ===
        walked("country").asInstanceOf[Map[String, Any]]("iso_code"))
    }
  }

  test("skipPrivateV6 = false restores the reference's enrich-anything walk") {
    import spark.implicits._
    // the reference applies NO private check to v6 (its regex is
    // v4-only): an InetAddress walk enriches a deliberately-mapped
    // unique-local network. The opt-out reproduces that exactly while
    // the default still prunes the probes a public database never hits.
    val db = MaxmindDb.read(MmdbFixture.write(dualStackEntries, ipVersion = 6))
    val mapper = GeoIpMapper(db.rangeDim(spark), Some(db.rangeDim6(spark)),
      skipPrivateV6 = false)
    val events = Seq((1L, "fd12::1"), (2L, "fe80::1"), (3L, "2001:db8::1"))
      .toDF("event_id", "_ip")
    val out = MapperPipeline.run(events, Seq(mapper))
      .select($"event_id", $"_country_code")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "XX") // the file maps fd00::/8 on purpose — enriched now
    assert(out(2L) === null) // link-local stays unmapped in the FILE, not skipped
    assert(out(3L) === "JP")
  }

  test("randomized v6 trees: enumeration == lookup at boundaries and probes") {
    // seeded random fixtures: distinct /32s are disjoint by
    // construction; random record widths exercise all three layouts
    val rnd = new scala.util.Random(20260815L)
    (0 until 5).foreach { round =>
      // top group ≥ 1 keeps generated /32s away from the ::-zero path
      // (whose literals redirect to the v4 dim by design)
      val prefixes = Seq.fill(40)(
        ((rnd.nextInt(0xFFFE) + 1) << 16) | rnd.nextInt(0x10000))
        .distinct.take(25)
      val entries = prefixes.zipWithIndex.map { case (p, i) =>
        val cidr = f"${p >>> 16}%x:${p & 0xFFFF}%x::/32"
        cidr -> (Map("country" -> Map("iso_code" -> f"C$i%02d")): Map[String, Any])
      }
      val rs = Seq(24, 28, 32)(round % 3)
      val db = MaxmindDb.read(
        MmdbFixture.write(entries, recordSize = rs, ipVersion = 6))
      val nets = db.networks6()
      assert(nets.size === entries.size, s"round $round")
      nets.foreach { case (lo, hi, data) =>
        assert(db.lookup(fmt16(lo)) === Some(data))
        assert(db.lookup(fmt16(hi)) === Some(data))
        // a random interior probe: keep the /32 prefix, randomize tail
        val mid = lo.clone()
        (4 until 16).foreach(i => mid(i) = rnd.nextInt(256).toByte)
        assert(db.lookup(fmt16(mid)) === Some(data))
      }
      // a prefix NOT in the set misses
      val missing = (0 until 200).iterator
        .map(_ => ((rnd.nextInt(0xFFFE) + 1) << 16) | rnd.nextInt(0x10000))
        .find(p => !prefixes.contains(p)).get
      assert(db.lookup(
        f"${missing >>> 16}%x:${missing & 0xFFFF}%x::1") === None)
    }
  }

  test("geoIpMapper facade wires the v6 dim for an ip_version-6 file") {
    import spark.implicits._
    val f = java.nio.file.Files.createTempFile("graft-geo6", ".mmdb")
    java.nio.file.Files.write(f,
      MmdbFixture.write(dualStackEntries, ipVersion = 6))
    try {
      val mapper = MaxmindDb.geoIpMapper(spark, f.toString)
      assert(mapper.rangesV6.isDefined)
      val out = MapperPipeline.run(
        Seq((1L, "2001:db8::1"), (2L, "1.0.0.7")).toDF("event_id", "_ip"),
        Seq(mapper))
      assert(out.orderBy($"event_id").select($"_country_code")
        .as[String].collect().toSeq === Seq("JP", "AU"))
    } finally java.nio.file.Files.delete(f)
  }

  test("data-section scalar types: ints, uint64, float, bool, bytes-free maps") {
    val rec = Map(
      "country" -> Map("iso_code" -> "FR"),
      "traits" -> Map("isp" -> "Orange"),
      "flag" -> true, "neg" -> false,
      "big" -> 0x1FFFFFFFFL, "small" -> 7L, "half" -> 2.5f)
    val db = MaxmindDb.read(MmdbFixture.write(Seq("10.1.0.0/16" -> rec)))
    val got = db.lookup("10.1.2.3").get.asInstanceOf[Map[String, Any]]
    assert(got("flag") === true)
    assert(got("neg") === false)
    assert(got("big") === 0x1FFFFFFFFL)
    assert(got("small") === 7L)
    assert(got("half") === 2.5f)
  }

  test("malformed files fail loudly, not quietly") {
    val e1 = intercept[MaxmindDb.MmdbFormatException](
      MaxmindDb.read(Array.fill[Byte](64)(0x42)))
    assert(e1.getMessage.contains("marker"))
    val good = MmdbFixture.write(cityEntries)
    // truncate inside the search tree: metadata stays intact? no —
    // truncation removes the metadata; the marker error is the signal
    val e2 = intercept[MaxmindDb.MmdbFormatException](
      MaxmindDb.read(good.take(10)))
    assert(e2.getMessage.contains("marker"))
  }
}
