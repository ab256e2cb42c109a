package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the source tree against raw control bytes.
  *
  * A single raw 0x00 (e.g. from a tool writing a literal NUL instead of
  * the backslash-u0000 escape) makes grep-family tools classify the whole file
  * as BINARY and silently skip it — so grep-based lints and leak scans
  * stop seeing the file's contents entirely. This spec fails on any
  * byte < 0x20 other than tab (0x09) and LF (0x0A) in any tracked
  * source file, so the corruption is caught the moment it lands.
  *
  * NOTE: CR (0x0D) is deliberately rejected too — LF-only line endings
  * are a repo requirement (keep `core.autocrlf` off / `input` on a
  * Windows checkout). Only NUL-family bytes trip grep's binary
  * heuristic, but admitting CR would let mixed line endings creep into
  * a tree whose generated-twin SQL and byte-hash oracles assume a
  * single canonical encoding.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources(root: String): Seq[Path] = {
    val base = Paths.get(root)
    if (!Files.isDirectory(base)) Seq.empty
    else
      Files
        .walk(base)
        .iterator()
        .asScala
        .filter(p => Files.isRegularFile(p))
        .filter(_.toString.endsWith(".scala"))
        .toSeq
  }

  test("no control bytes (other than tab/LF) in any .scala source") {
    val offenders = for {
      p <- scalaSources("src")
      data = Files.readAllBytes(p)
      i <- data.indices
      b = data(i) & 0xff
      if b < 0x20 && b != 0x09 && b != 0x0a
    } yield {
      val lo = math.max(0, i - 40)
      val hi = math.min(data.length, i + 40)
      val ctx = new String(data.slice(lo, hi).map(x => if ((x & 0xff) < 0x20) '?'.toByte else x), "UTF-8")
      s"$p: byte 0x${"%02x".format(b)} at offset $i near [$ctx]"
    }
    assert(offenders.isEmpty, "raw control bytes found:\n" + offenders.mkString("\n"))
  }

  test("grep does not classify any .scala source as binary") {
    // The practical symptom the byte-level check protects against:
    // `grep -rI` must see every source file as text.
    val all = scalaSources("src")
    val binary = all.filter { p =>
      val data = Files.readAllBytes(p)
      data.contains(0.toByte)
    }
    assert(binary.isEmpty, s"NUL-bearing (grep-binary) sources: ${binary.mkString(", ")}")
  }
}
