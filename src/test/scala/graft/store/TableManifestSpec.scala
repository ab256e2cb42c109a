package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** The commit log's scale contract, pinned directly (CompactionSpec
  * drives it through the store): a commit writes O(its delta), not
  * O(table files) — the property that keeps the log writable when the
  * table holds 10⁵–10⁶ files — checkpoints bound the reader's fold,
  * and vacuum drops the log tail without breaking any retained
  * version's resolution. */
class TableManifestSpec extends AnyFunSuite {

  private def touch(table: String, rel: String): Unit = {
    val f = new java.io.File(table, rel)
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, Array[Byte](1))
  }

  test("a commit's file holds its DELTA only, however many files the " +
    "table already tracks") {
    val table = graft.TempDirs.scratch("graft-tm-delta").toString
    // 500 tracked files from one bootstrap commit…
    val bulk = (0 until 500).map(i => f"_month=2026-01/part-bulk-$i%04d.parquet")
    bulk.foreach(touch(table, _))
    TableManifest.commit(table, bulk)
    // …then a 2-file append: its commit file must carry 2 lines
    val delta = Seq("_month=2026-01/part-x.parquet", "_month=2026-01/part-y.parquet")
    delta.foreach(touch(table, _))
    val v = TableManifest.commit(table, delta)
    val lines = java.nio.file.Files.readAllLines(new java.io.File(table,
      f"${TableManifest.DirName}/commit-v$v%09d.txt").toPath)
    assert(lines.size == 2, s"append commit wrote ${lines.size} lines — " +
      "O(table) manifests don't survive 100 TB")
    assert(TableManifest.latest(table).get._2.size == 502)
  }

  test("checkpoints bound the fold and vacuum drops the log tail; " +
    "every retained version still resolves exactly") {
    val table = graft.TempDirs.scratch("graft-tm-ckpt").toString
    val all = scala.collection.mutable.Set[String]()
    // 40 single-file commits → ≥2 checkpoints at CheckpointEvery=16
    (0 until 40).foreach { i =>
      val rel = f"_month=2026-02/part-c$i%04d.parquet"
      touch(table, rel)
      all += rel
      TableManifest.commit(table, Seq(rel))
    }
    val mdir = new java.io.File(table, TableManifest.DirName)
    def names = mdir.list().toSeq.sorted
    assert(names.count(_.startsWith("checkpoint-")) >= 2)
    assert(TableManifest.latest(table) == Some(40L -> all.toSet))

    // a rewrite commit swaps 5 old files for 1; pre-vacuum, disk still
    // holds the removed files and older versions resolve them
    val removed = all.take(5).toSeq
    touch(table, "_month=2026-02/part-compacted.parquet")
    val v = TableManifest.commit(table,
      Seq("_month=2026-02/part-compacted.parquet"), removed)
    assert(v == 41L)
    assert(TableManifest.filesAt(table, 41).size == 36)
    assert(TableManifest.filesAt(table, 40) == all.toSet,
      "pinned pre-rewrite version must still list the removed files")

    // vacuum(retain=2): versions 40 and 41 stay resolvable — the
    // removed files must SURVIVE (v40 references them)…
    TableManifest.vacuum(table, retainVersions = 2, graceMs = 0L)
    assert(removed.forall(r => new java.io.File(table, r).exists()),
      "vacuum deleted files a retained version references")
    assert(TableManifest.filesAt(table, 40) == all.toSet)
    // …and the log tail behind the checkpoint base is gone
    assert(names.count(_.startsWith("commit-")) < 41)

    // vacuum(retain=1): now only v41 is promised; the swapped-out
    // files go, the survivors stay byte-identical
    TableManifest.vacuum(table, retainVersions = 1, graceMs = 0L)
    assert(removed.forall(r => !new java.io.File(table, r).exists()))
    assert(TableManifest.latest(table).get._2 ==
      all.toSet -- removed + "_month=2026-02/part-compacted.parquet")
  }

  test("CAS losers replay their delta: N racing committers all land") {
    val table = graft.TempDirs.scratch("graft-tm-race").toString
    val fail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        try (0 until 10).foreach { i =>
          val rel = f"_month=2026-03/part-t$t-$i%02d.parquet"
          touch(table, rel)
          TableManifest.commit(table, Seq(rel))
        } catch { case e: Throwable => fail.set(e) }
      }, s"committer-$t")
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(fail.get() == null, s"committer failed: ${fail.get()}")
    val (v, files) = TableManifest.latest(table).get
    assert(v == 80L, s"80 commits expected, log ends at $v")
    assert(files.size == 80, s"lost files: ${80 - files.size}")
  }
}
