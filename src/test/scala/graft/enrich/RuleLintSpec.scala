package graft.enrich

import java.util.regex.Pattern
import org.scalatest.funsuite.AnyFunSuite
import graft.analytics.MapperQueries

/** Dead-rule / precedence lint for the M2/M3 rule tables.
  *
  * The m2/m3 DuckDB twins are GENERATED from [[UaRules]] in declaration
  * order, so a rule shadowed by an earlier, more generic token parses
  * wrong on BOTH engines and still passes the oracle — the one bug
  * class the cross-engine check structurally cannot catch (it caught
  * nothing when Messenger sat behind Facebook's `FBAV/` token; that was
  * found by hand, commit 7e88f36). This spec closes the class: every
  * rule must be the FIRST match of at least one registered sample, so
  * (a) no rule is unreachable behind an earlier token, and (b) every
  * new rule must ship with a witness sample that resolves to it.
  *
  * First-match is evaluated here with java.util.regex `find()` — the
  * exact semantics of `Column.rlike` that the mapper chain compiles to
  * (and of DuckDB's `regexp_matches`; the tables are RE2-safe).
  */
class RuleLintSpec extends AnyFunSuite {

  /** indices of `detects` that are no sample's first match */
  private def unreachable(detects: Seq[String], samples: Seq[String]): Seq[Int] = {
    val compiled = detects.map(Pattern.compile)
    val hit = Array.fill(detects.length)(false)
    samples.foreach { s =>
      val i = compiled.indexWhere(_.matcher(s).find())
      if (i >= 0) hit(i) = true
    }
    hit.indices.filterNot(hit).toSeq
  }

  private def report(label: String, rules: Seq[(String, String)], bad: Seq[Int]): String =
    s"$label rules never first-matched by any sample (shadowed or missing a witness):\n" +
      bad.map(i => s"  [$i] ${rules(i)._1}  detect=${rules(i)._2}").mkString("\n")

  private val browserDetects = UaRules.browsers.map(_.detect)

  test("every browser rule is some UA sample's first match") {
    val bad = unreachable(browserDetects, MapperQueries.uaSamples)
    assert(bad.isEmpty, report("browser",
      UaRules.browsers.map(r => r.family -> r.detect), bad))
  }

  test("every OS rule is some UA sample's first match") {
    val bad = unreachable(UaRules.oses.map(_.detect), MapperQueries.uaSamples)
    assert(bad.isEmpty, report("os",
      UaRules.oses.map(r => s"${r.family}${if (r.literal.nonEmpty) " " + r.literal else ""}" -> r.detect), bad))
  }

  test("every device rule is some non-Spider UA sample's first match, and captures") {
    // Spider preempts the device table in the mapper, so a sample only
    // witnesses a device rule if its browser family is not Spider
    val spider = Pattern.compile(UaRules.browsers.head.detect)
    val samples = MapperQueries.uaSamples.filterNot(s => spider.matcher(s).find())
    val bad = unreachable(UaRules.devices.map(_.detect), samples)
    assert(bad.isEmpty, report("device",
      UaRules.devices.map(r => (if (r.family.nonEmpty) r.family else r.prefix + "<capture>") -> r.detect), bad))
    // capture-family rules must actually capture a non-empty model on
    // their witness (regexp_extract returns "" on a group miss — the
    // family would silently collapse to the bare prefix)
    val compiled = UaRules.devices.map(r => Pattern.compile(r.detect))
    UaRules.devices.zipWithIndex.filter(_._1.family.isEmpty).foreach { case (r, i) =>
      val witnesses = samples.filter { s =>
        compiled.indexWhere(_.matcher(s).find()) == i
      }
      assert(witnesses.exists { s =>
        val m = compiled(i).matcher(s); m.find() && m.groupCount >= 1 &&
          m.group(1) != null && m.group(1).nonEmpty
      }, s"device rule [$i] ${r.prefix}<capture> detect=${r.detect} matched a witness but captured nothing")
    }
  }

  test("every referrer rule is some sample URL's first match") {
    // host extraction mirrors the mapper's parse_url(_, 'HOST') + lower:
    // all well-formed samples are plain scheme://host/path?query
    val hosts = MapperQueries.refSamples.flatMap { u =>
      try Option(new java.net.URI(u).getHost).map(_.toLowerCase)
      catch { case _: Exception => None }
    }
    val bad = unreachable(UaRules.referers.map(_.hostRe), hosts)
    assert(bad.isEmpty, report("referrer",
      UaRules.referers.map(r => s"${r.source}/${r.medium}" -> r.hostRe), bad))
  }

  /** indices of versioned rules none of whose first-match witnesses
    * yield a non-empty group-1 extraction — a broken version regex
    * returns "" on BOTH engines (null version), so the oracle agrees
    * with the bug; this closes that class. */
  private def versionGaps(detects: Seq[String],
      versions: Seq[String]): Seq[Int] = {
    val compiled = detects.map(Pattern.compile)
    versions.indices.filter(versions(_).nonEmpty).filterNot { i =>
      val vp = Pattern.compile(versions(i))
      MapperQueries.uaSamples.exists { s =>
        compiled.indexWhere(_.matcher(s).find()) == i && {
          val m = vp.matcher(s)
          m.find() && m.groupCount >= 1 && m.group(1) != null && m.group(1).nonEmpty
        }
      }
    }
  }

  test("every versioned browser rule extracts a version from some witness") {
    val bad = versionGaps(browserDetects, UaRules.browsers.map(_.version))
    assert(bad.isEmpty, "versioned rules whose witnesses never extract:\n" +
      bad.map(i => s"  [$i] ${UaRules.browsers(i).family}  version=${UaRules.browsers(i).version}")
        .mkString("\n"))
  }

  test("every versioned OS rule extracts a version from some witness") {
    val bad = versionGaps(UaRules.oses.map(_.detect), UaRules.oses.map(_.versionRe))
    assert(bad.isEmpty, "versioned OS rules whose witnesses never extract:\n" +
      bad.map(i => s"  [$i] ${UaRules.oses(i).family}  version=${UaRules.oses(i).versionRe}")
        .mkString("\n"))
  }

  test("negative control: demoting Messenger below Facebook is caught") {
    // re-create the exact 7e88f36 bug: move the Messenger rule to just
    // AFTER the generic Facebook rule — its token is then consumed by
    // FBAN/, so no sample first-matches it and the lint must flag it
    val mi = UaRules.browsers.indexWhere(_.family == "Facebook Messenger")
    val fi = UaRules.browsers.indexWhere(_.family == "Facebook")
    assert(mi >= 0 && fi == mi + 1, "fixture drift: Messenger must sit directly before Facebook")
    val demoted = browserDetects.patch(mi, Seq(browserDetects(fi), browserDetects(mi)), 2)
    val bad = unreachable(demoted, MapperQueries.uaSamples)
    assert(bad.contains(mi + 1), "lint failed to flag the shadowed Messenger rule")
  }

  test("negative control: demoting a brand-subdomain referrer below its " +
    "brand rule is caught (the email-vs-search precedence class)") {
    // the referrer table's own precedence bug class: a webmail host on
    // a brand domain (email.seznam.cz) demoted below the brand's
    // SEARCH rule is consumed by it — traffic silently reclassified
    // email → search on BOTH engines. The lint must flag the demoted
    // rule as first-matched by nothing.
    val rules = UaRules.referers
    val ei = rules.indexWhere(_.source == "seznam-email")
    val si = rules.indexWhere(_.source == "seznam")
    assert(ei >= 0 && si > ei, "fixture drift: seznam-email must precede seznam")
    val detects = rules.map(_.hostRe)
    // move seznam-email to directly after seznam
    val demoted = detects.patch(ei, Nil, 1).patch(si, Seq(detects(ei)), 0)
    val hosts = MapperQueries.refSamples.flatMap { u =>
      try Option(new java.net.URI(u).getHost).map(_.toLowerCase)
      catch { case _: Exception => None }
    }
    val bad = unreachable(demoted, hosts)
    assert(bad.contains(si), "lint failed to flag the demoted seznam-email rule")
  }
}
