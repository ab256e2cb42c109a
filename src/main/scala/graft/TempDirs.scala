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

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { root =>
      try {
        if (Files.exists(root)) {
          Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
        }
      } catch { case _: Exception => () } // best-effort at exit
    }
  }, "graft-tempdir-sweeper"))

  /** A fresh temp directory swept (recursively) at JVM exit. */
  def scratch(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
}
