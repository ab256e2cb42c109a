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
  /** key → (current tree, previous tree) — see [[scratchFor]]. */
  private val keyed =
    scala.collection.mutable.HashMap.empty[String, (Path, Option[Path])]

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

  /** Scratch base directory: `SPARK_GRAFT_SCRATCH_DIR` if set, else the
    * first entry of `SPARK_LOCAL_DIRS` (the same knob Spark's own
    * shuffle/spill scratch honors), else the JVM default tmpdir. The
    * fixture-materializing sources (s3 CSV, s4 Avro, s6 remote-bulk)
    * round-trip a table copy through this directory, so on a host whose
    * /tmp is slow or contended (the r14 driver bench saw specific
    * ingest rows stall 50-100× on I/O bursts) the operator points it at
    * fast local storage — exactly how SPARK_LOCAL_DIRS is deployed. */
  private lazy val base: Option[Path] =
    sys.env.get("SPARK_GRAFT_SCRATCH_DIR")
      .orElse(sys.env.get("SPARK_LOCAL_DIRS")
        .flatMap(_.split(',').map(_.trim).find(_.nonEmpty)))
      .map { d =>
        val p = java.nio.file.Paths.get(d)
        Files.createDirectories(p)
        p
      }

  /** A fresh temp directory swept (recursively) at JVM exit. */
  def scratch(prefix: String): Path = {
    val p = base match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    created.add(p)
    p
  }

  /** A fresh scratch for a recurring producer (a query re-invoked in
    * one long-lived JVM — bench reps, a serving gateway): each call
    * eagerly deletes the tree TWO generations back, so the JVM holds
    * at most two live copies per key instead of one per invocation.
    * The one-generation grace matters because callers return LAZY
    * DataFrames over the scratch path — the (n−1)th invocation's plan
    * may still be executing when the nth invocation creates its tree,
    * and deleting it immediately would yank files mid-read. Both
    * surviving generations still get the exit sweep. */
  def scratchFor(key: String): Path = {
    val fresh = scratch(key)
    val evicted = keyed.synchronized {
      val prior = keyed.get(key)
      keyed.put(key, (fresh, prior.map(_._1)))
      prior.flatMap(_._2)
    }
    evicted.foreach { p => created.remove(p); deleteTree(p) }
    fresh
  }

  /** Eagerly delete a [[scratch]] tree whose consumer has finished
    * executing (every Spark action over the path complete). For
    * request-scoped scratches — e.g. a gateway bulk body, where
    * concurrent requests must not share a keyed slot — callers take a
    * private `scratch` and release it in a `finally`. Idempotent with
    * the exit sweep. */
  def release(p: Path): Unit = {
    created.remove(p)
    deleteTree(p)
  }
}
