package graft.store

import java.io.File
import java.nio.file.Files

/** Versioned file manifests for an [[EventStore]] table — the reader
  * side of the multi-driver story (r14 made WRITERS safe with staged
  * appends and file-scoped compaction; this closes the residual gap
  * SCALE.md named: a reader listing a partition mid-compaction could
  * briefly see old AND new copies of a rewritten row).
  *
  * The [[graft.store.AnnIndex]] generation fence, generalized: a
  * table's committed state is the file LIST in its newest
  * `_manifests/manifest-v{N}.txt`, not whatever a directory listing
  * happens to return. Writers commit by creating the NEXT version with
  * an atomic hard-link publish (create-if-absent with full content —
  * the same atomic-create class as the `_rewrite.lock` fence: local
  * and HDFS-like filesystems have it, S3 deployments front it with a
  * coordinator, see SCALE.md §multi-driver); a loser re-reads and
  * replays its DELTA (adds/removes are set operations, so replay over
  * a moved baseline is exact). Readers pin the newest manifest once
  * per query — the DataFrame's file list is fixed at resolution, so a
  * scan races nothing. The reference gets all of this from Postgres
  * MVCC (PostgresqlEventStore.java:83-101); on a file store it has to
  * be built, and this is the standard lakehouse shape (Delta/Iceberg
  * commit protocols) reduced to what the store needs: one list, one
  * CAS, no column stats.
  *
  * Physical deletion is DECOUPLED from logical removal: compaction
  * commits a manifest that drops the rewritten files but leaves them
  * on disk for readers pinned to older versions; [[vacuum]] later
  * removes files no retained manifest references. (The one exception
  * is right-to-be-forgotten, where prompt physical erasure outranks
  * reader snapshot stability — [[EventStore.deleteUser]] deletes
  * immediately after its commit.)
  *
  * Pre-manifest tables migrate seamlessly: the first commit ADOPTS the
  * on-disk file set as its baseline, and readers fall back to the
  * directory listing until a manifest exists.
  */
private[graft] object TableManifest {

  val DirName = "_manifests"
  private val Name = raw"manifest-v(\d{9})\.txt".r

  private def manifestDir(table: String) = new File(table, DirName)
  private def fileFor(table: String, v: Long) =
    new File(manifestDir(table), f"manifest-v$v%09d.txt")

  def exists(table: String): Boolean = latestVersion(table).isDefined

  def latestVersion(table: String): Option[Long] = {
    val d = manifestDir(table)
    if (!d.isDirectory) None
    else Option(d.list()).getOrElse(Array.empty).collect {
      case Name(v) => v.toLong
    }.maxOption
  }

  /** The committed file list (table-relative paths) of one version. */
  def filesAt(table: String, v: Long): Set[String] = {
    val raw = Files.readAllLines(fileFor(table, v).toPath)
    import scala.jdk.CollectionConverters._
    raw.asScala.filter(_.nonEmpty).toSet
  }

  /** Newest committed (version, file list), if any manifest exists. */
  def latest(table: String): Option[(Long, Set[String])] =
    latestVersion(table).map(v => v -> filesAt(table, v))

  /** All committed `part-*` data files currently on disk — the adopt
    * baseline for a table predating the manifest layer, and vacuum's
    * view of physical state. Skips hidden/staging/system dirs with the
    * same rule as the staged-append publish: only `key=value` partition
    * dirs are descended. */
  def diskFiles(table: String): Set[String] = {
    val root = new File(table)
    def walk(dir: File, prefix: String): Iterator[String] =
      Option(dir.listFiles()).getOrElse(Array.empty).iterator.flatMap { f =>
        if (f.isDirectory && f.getName.contains("="))
          walk(f, s"$prefix${f.getName}/")
        else if (f.isFile && f.getName.startsWith("part-"))
          Iterator(s"$prefix${f.getName}")
        else Iterator.empty
      }
    if (!root.isDirectory) Set.empty else walk(root, "").toSet
  }

  /** Commit a delta against the newest manifest: CAS-create the next
    * version; on losing the race, re-read and replay. Returns the
    * committed version. A table with no manifest adopts the on-disk
    * file set as the baseline of v1 (minus `remove` — a first commit
    * can already be a rewrite). */
  def commit(table: String, add: Iterable[String],
      remove: Iterable[String] = Nil): Long = {
    Files.createDirectories(manifestDir(table).toPath)
    var attempt = 0
    while (true) {
      val (prevV, base) = latest(table).getOrElse((0L, diskFiles(table)))
      val next = base -- remove ++ add
      val target = fileFor(table, prevV + 1)
      val tmp = File.createTempFile(".commit-", ".tmp", manifestDir(table))
      try {
        Files.write(tmp.toPath, next.toSeq.sorted.mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try {
          // hard link = atomic create WITH full content: no reader can
          // observe a half-written manifest, and an existing target
          // (a concurrent winner) throws instead of being clobbered
          Files.createLink(target.toPath, tmp.toPath)
          return prevV + 1
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            attempt += 1
            if (attempt > 100) throw new IllegalStateException(
              s"manifest CAS on $table lost ${attempt} races — livelock?")
            Thread.sleep(attempt.min(10).toLong)
        }
      } finally { tmp.delete(): Unit }
    }
    -1L // unreachable
  }

  /** Absolute paths of the pinned snapshot, or None when the table has
    * no manifest yet (pre-manifest layout: caller directory-lists). */
  def snapshot(table: String): Option[Seq[String]] =
    latest(table).map { case (_, fs) =>
      fs.toSeq.sorted.map(rel => new File(table, rel).getAbsolutePath)
    }

  /** Physically delete files no retained manifest references, plus the
    * superseded manifests themselves. `retainVersions` manifests are
    * kept (≥1 — the newest is never dropped), so readers pinned up to
    * that many commits ago still resolve every file. `graceMs` skips
    * files younger than the window: an in-flight staged append moves
    * its part files in BEFORE committing them, and vacuum must not
    * reap that gap (the move preserves the just-written mtime).
    * Returns the number of data files deleted. */
  def vacuum(table: String, retainVersions: Int = 1,
      graceMs: Long = 10 * 60 * 1000L): Int = {
    require(retainVersions >= 1, "must retain at least the newest manifest")
    val d = manifestDir(table)
    if (!d.isDirectory) return 0
    val versions = Option(d.list()).getOrElse(Array.empty).collect {
      case Name(v) => v.toLong
    }.sorted
    if (versions.isEmpty) return 0
    val retained = versions.takeRight(retainVersions)
    val referenced = retained.iterator.flatMap(filesAt(table, _)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    var deleted = 0
    (diskFiles(table) -- referenced).foreach { rel =>
      val f = new File(table, rel)
      if (f.lastModified() < cutoff && f.delete()) {
        deleted += 1
        new File(f.getParentFile, s".${f.getName}.crc").delete(): Unit
      }
    }
    versions.dropRight(retainVersions)
      .foreach(v => fileFor(table, v).delete(): Unit)
    // orphaned staging dirs from crashed appenders age out on the same
    // grace window (a live appender's staging dir is younger than it)
    Option(new File(table).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".staging-") &&
        f.lastModified() < cutoff)
      .foreach(rmrf)
    deleted
  }

  private def rmrf(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
    f.delete(): Unit
  }
}
