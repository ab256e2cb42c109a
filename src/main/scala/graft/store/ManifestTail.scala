package graft.store

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Manifest-aware streaming tail (closes the r15 "what's missing #2"):
  * the file-source subscription used to tail the TABLE directory, so a
  * compaction's rewritten part files re-entered a live tail as fresh
  * rows — silent duplicates. The reference never has this problem
  * because its tail is Kafka offsets (KafkaOffsetManager.java:24-90);
  * this is the same idea restated on the [[TableManifest]] commit log:
  * the tail advances through COMMIT VERSIONS, and only the files an
  * append-only commit ADDED become visible to the stream. A rewrite
  * commit — adds and removes in one version (compaction, erasure) — is
  * recognized as a rewrite and contributes nothing: its added files
  * are rewritten copies of rows the tail already delivered.
  *
  * Mechanically, each subscription owns a hidden SPOOL directory inside
  * the table (`.tail-<subId>/`, invisible to batch scans, manifest
  * adoption and vacuum alike), and [[advance]] hard-links committed
  * files into it preserving their partition-relative paths. The
  * Structured Streaming file source then tails the spool — Spark's own
  * checkpoint provides the per-file exactly-once bookkeeping, and this
  * layer controls WHICH files ever become visible. Hard links cost no
  * data copy and keep the spooled batch readable even after a vacuum
  * reaps the original (a tail that lags a compaction never loses rows);
  * on a filesystem without link support the advance degrades to a copy.
  *
  * Crash-safety: the spool's `_version` marker is written (atomically,
  * temp + move) only AFTER a version's links land, and re-linking an
  * existing link is a no-op — a crash mid-advance replays idempotently.
  */
object ManifestTail {

  private val Marker = "_version"

  /** The spool directory for one subscription — dot-prefixed inside the
    * table so every directory walker (partition discovery, manifest
    * adoption via [[TableManifest.diskFiles]], vacuum's staging sweep)
    * skips it. `subId` must be a path-safe token (the gateway enforces
    * alphanumeric ids). */
  def spoolDir(table: String, subId: String): File =
    new File(table, s".tail-$subId")

  private def readVersion(spool: File): Long = {
    val m = new File(spool, Marker)
    if (!m.isFile) -1L
    else new String(Files.readAllBytes(m.toPath), "UTF-8").trim.toLong
  }

  private def writeVersion(spool: File, v: Long): Unit = {
    val tmp = File.createTempFile(".version-", ".tmp", spool)
    Files.write(tmp.toPath, v.toString.getBytes("UTF-8"))
    Files.move(tmp.toPath, new File(spool, Marker).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def linkIn(table: String, spool: File, rel: String): Unit = {
    val dst = new File(spool, rel)
    if (dst.isFile) return // idempotent replay of a crashed advance
    val src = new File(table, rel)
    // an append-committed file the tail never spooled but vacuum already
    // reaped (the rows live on only in a rewrite this tail skips): the
    // tail has LOST data — fail loudly, exactly like the vacuumed-log
    // case below; silent skip here would be the one silent gap in the
    // failOnDataLoss contract
    if (!src.isFile) throw new IllegalStateException(
      s"tail on $table fell behind the vacuum retention window " +
        s"($rel was superseded and reaped before the tail spooled it) — " +
        "recreate the subscription; raise vacuum retention to cover tail lag")
    dst.getParentFile.mkdirs()
    try Files.createLink(dst.toPath, src.toPath)
    catch {
      case _: java.nio.file.FileAlreadyExistsException => () // racing advancers
      case _: UnsupportedOperationException =>
        Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }

  private val Poisoned = "_poisoned"

  /** Reflect the commit log into the spool up to the current head.
    * First call fills from the head SNAPSHOT (the exactly-once view of
    * history — per-commit replay would both resurrect compacted-away
    * duplicates and trip over vacuumed originals); subsequent calls walk
    * `(spoolVersion, head]` and link only append-only commits' adds.
    * Returns the new spool version. Throws if the spool has fallen
    * behind the vacuum retention window (the needed commit files are
    * gone) — the failOnDataLoss contract: a silent gap in a tail feeding
    * incremental consumers is corruption, so the caller must recreate
    * the subscription instead. */
  def advance(table: String, spool: File): Long = {
    spool.mkdirs()
    val poison = new File(spool, Poisoned)
    if (poison.isFile) throw new IllegalStateException(
      new String(Files.readAllBytes(poison.toPath), "UTF-8"))
    val head = TableManifest.latestVersion(table).getOrElse(0L)
    val cur = readVersion(spool)
    // liveness heartbeat: sweepStale reaps spools whose marker went
    // cold, so an idle-but-polled tail must refresh it even with no
    // new commits to reflect
    val marker = new File(spool, Marker)
    if (marker.isFile) marker.setLastModified(System.currentTimeMillis()): Unit
    if (cur < 0L) {
      if (head > 0L)
        TableManifest.filesAt(table, head).foreach(linkIn(table, spool, _))
      writeVersion(spool, head)
      return head
    }
    if (head <= cur) return cur
    ((cur + 1) to head).foreach { v =>
      val (adds, removes) =
        try TableManifest.commitDelta(table, v)
        catch {
          case _: java.nio.file.NoSuchFileException =>
            throw new IllegalStateException(
              s"tail on $table fell behind the vacuum retention window " +
                s"(commit v$v no longer resolvable) — recreate the " +
                "subscription; raise vacuum retention to cover tail lag")
        }
      // a commit carrying removes is a REWRITE (compaction/erasure):
      // its adds are rewritten copies of rows this tail already served
      if (removes.isEmpty) adds.foreach(linkIn(table, spool, _))
      writeVersion(spool, v)
    }
    head
  }

  /** Drop spool links older than `olderThanMs` — disk hygiene for
    * long-lived tails (a spooled link pins its inode past vacuum).
    * Spark's file-source checkpoint tracks processed files by path, so
    * pruning a PROCESSED link is safe; the window must comfortably
    * exceed the subscription's poll lag or unprocessed rows are lost —
    * hence opt-in, never automatic. */
  def prune(spool: File, olderThanMs: Long): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    def walk(d: File): Unit =
      Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.startsWith("part-") && f.lastModified() < cutoff &&
          f.delete()) n += 1
      }
    walk(spool)
    n
  }

  /** Remove the spool entirely (subscription deleted). */
  def drop(spool: File): Unit = {
    def rmrf(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(spool)
  }

  /** Erasure support: physically remove the given table-relative paths
    * from EVERY spool under the table — a hard link would otherwise keep
    * a forgotten user's rows alive past [[EventStore.deleteUser]]. A
    * spool that actually LOST links is POISONED: the stream may not yet
    * have read them (rows of OTHER users in those files would then
    * silently vanish from the tail), and there is no way to know from
    * outside Spark's source log — so the next advance/poll fails with a
    * recreate-the-subscription error instead of serving a silent gap,
    * the same failOnDataLoss posture as the vacuum cases. The recreated
    * tail fills from the post-erasure head snapshot. */
  private[store] def purgeFromSpools(table: File, rels: Seq[String]): Unit =
    Option(table.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".tail-"))
      .foreach { sp =>
        var purged = false
        rels.foreach { rel =>
          if (Files.deleteIfExists(new File(sp, rel).toPath)) purged = true
        }
        if (purged)
          Files.write(new File(sp, Poisoned).toPath,
            ("erasure rewrote files this tail had spooled — recreate the " +
              "subscription (it will refill from the post-erasure snapshot)")
              .getBytes("UTF-8")): Unit
      }

  /** Reap spools whose liveness marker went cold (default: a day) —
    * subscriptions are session-scoped, so a crashed/restarted gateway's
    * spools would otherwise pin their vacuumed inodes forever. A LIVE
    * tail's marker is touched on every [[advance]], so active spools of
    * OTHER gateways sharing the warehouse survive the sweep. Returns
    * the number of spools dropped. */
  def sweepStale(projectDir: String, olderThanMs: Long = 24 * 3600 * 1000L): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    var n = 0
    Option(new File(projectDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).foreach { table =>
        Option(table.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(".tail-"))
          .foreach { sp =>
            val m = new File(sp, Marker)
            val mtime = if (m.isFile) m.lastModified() else sp.lastModified()
            if (mtime < cutoff) { drop(sp); n += 1 }
          }
      }
    n
  }
}
