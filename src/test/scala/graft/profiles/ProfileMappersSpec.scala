package graft.profiles

import graft.SparkSpec
import graft.enrich.{GeoIpMapper, UserAgentMapper, XffIpMapper}

/** M8: the event-enrichment mappers applied to the profile op-log —
  * mirrors the reference running UserPropertyMapper chains over
  * `/user/batch_operations` (UserHttpService.java:135-170): a raw
  * `_user_agent` / X-Forwarded-For in a set_properties op arrives in the
  * store parsed and geo-enriched, and the merged profile carries the
  * derived fields. */
class ProfileMappersSpec extends SparkSpec {
  import spark.implicits._

  private val chrome = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) " +
    "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36"

  private def op(id: String, seq: Long, props: Map[String, String]) =
    ProfileOp("p1", id, 1000L + seq, seq, ProfileOps.Set, props)

  test("op-log props are enriched by the same mappers events get") {
    val ranges = Seq((16777216L, 16777471L, "AU", "Sydney"))
      .toDF("ip_lo", "ip_hi", "_country_code", "_city")
    val ops = Seq(
      op("u1", 1, Map("plan" -> "pro", "_user_agent" -> chrome,
        "_x_forwarded_for" -> "10.0.0.1, 1.0.0.5")),
      op("u2", 2, Map("plan" -> "free"))).toDS()
    val enriched = ProfileMappers.enrich(ops,
      Seq(UserAgentMapper, XffIpMapper, GeoIpMapper(ranges)))
      .collect().sortBy(_.id)

    val u1 = enriched(0).props
    assert(u1("plan") == "pro") // untouched payload survives
    assert(u1("_user_agent_family") == "Chrome")
    assert(u1("_os") == "Windows")
    // XFF extracted the first PUBLIC ip, then geo enriched from it
    assert(u1("_ip") == "1.0.0.5")
    assert(u1("_country_code") == "AU" && u1("_city") == "Sydney")

    // u2 had no triggers: payload unchanged, no null-noise keys added
    val u2 = enriched(1).props
    assert(u2 == Map("plan" -> "free"))

    // op identity (kind/ts/seq) is untouched — merge order is preserved
    assert(enriched.map(o => (o.kind, o.seq)).toSeq ==
      Seq((ProfileOps.Set, 1L), (ProfileOps.Set, 2L)))
  }

  test("enrichment is idempotent and flows through the profile merge") {
    val ops = Seq(op("u3", 1, Map("_user_agent" -> chrome))).toDS()
    val once = ProfileMappers.enrich(ops, Seq(UserAgentMapper))
    val twice = ProfileMappers.enrich(once, Seq(UserAgentMapper))
    assert(once.collect().toSeq == twice.collect().toSeq)

    // the merged profile carries the derived fields (the reference's
    // net effect: parsed properties land in the _users row)
    val profile = ProfileMerge.merge(once).collect().head
    val props = profile.getAs[Map[String, String]]("properties")
    assert(props("_user_agent_family") == "Chrome")
  }
}
