package graft

import java.nio.file.{Files, Path}

/** Scratch directories for queries that must materialize a fixture
  * file (the CSV/Avro/remote-bulk source rows re-ingest a table
  * through a real file). `File.deleteOnExit` is a no-op on non-empty
  * directories, so repeated runs would leak a table copy into /tmp per
  * execution; this registers ONE shutdown hook that recursively
  * deletes every scratch tree the JVM created. Deletion is exit-time
  * (not eager) because the returned path feeds a LAZY DataFrame — the
  * file must still exist when the plan executes. */
object TempDirs {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val keyed = new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def deleteTree(root: Path): Unit =
    try {
      if (Files.exists(root)) {
        Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      }
    } catch { case _: Exception => () } // best-effort

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach(deleteTree)
  }, "graft-tempdir-sweeper"))

  /** A fresh temp directory swept (recursively) at JVM exit. */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  /** A fresh scratch for a recurring producer (a query re-invoked in
    * one long-lived JVM — bench reps, a serving gateway): the PREVIOUS
    * tree registered under the same key is deleted NOW, so the JVM
    * holds at most one live copy per key instead of one per
    * invocation. Safe because a key's previous tree only backs plans
    * from the prior invocation of the same query, which the caller has
    * already executed; the current tree still gets the exit sweep. */
  def scratchFor(key: String): Path = {
    val fresh = scratch(key)
    val prev = keyed.put(key, fresh)
    if (prev != null) { created.remove(prev); deleteTree(prev) }
    fresh
  }
}
