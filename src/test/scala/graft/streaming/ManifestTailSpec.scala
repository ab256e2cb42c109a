package graft.streaming

import graft.SparkSpec
import graft.store.{EventStore, ManifestTail, TableManifest}
import org.apache.spark.sql.functions._

/** The manifest-aware tail (r15 "what's missing #2"): a live
  * subscription must survive compaction with NO duplicate delivery —
  * the Kafka-offset contract (KafkaOffsetManager.java:24-90) restated
  * on the commit log. The old direct-directory tail re-delivered a
  * rewritten partition's fresh part files as new rows. */
class ManifestTailSpec extends SparkSpec {
  import spark.implicits._

  private def batch(b: Int, n: Int = 50) = (0 until n)
    .map(i => (b.toLong * n + i, s"u${i % 5}"))
    .toDF("event_id", "_user")
    .withColumn("_time", lit("2026-03-10 12:00:00").cast("timestamp"))

  private def schemaOf() = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_user",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_time",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("_month",
      org.apache.spark.sql.types.StringType)))

  test("compaction under a live tail delivers no duplicates; appends " +
    "before AND after keep flowing exactly once") {
    val warehouse = graft.TempDirs.scratch("graft-mtail").toString
    (0 until 2).foreach(b => EventStore.write(batch(b), warehouse, "demo", "tap"))
    val table = EventStore.tablePath(warehouse, "demo", "tap")

    val (stream, advance) =
      Subscriptions.manifestStream(spark, schemaOf(), table, "sub1")
    val q = stream.writeStream.format("memory").queryName("mtail_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def ids() = spark.table("mtail_out")
        .select("event_id").collect().map(_.getLong(0))
      assert(ids().length == 100 && ids().toSet == (0L until 100L).toSet,
        "initial head snapshot not delivered exactly once")

      // compact the partition the tail is watching — the rewrite commit
      // must contribute NOTHING to the tail
      EventStore.compactPartition(spark, warehouse, "demo", "tap",
        month = "2026-03", rowsPerFile = 1_000_000L)
      advance()
      q.processAllAvailable()
      assert(ids().length == 100,
        s"compaction re-delivered rewritten rows: ${ids().length - 100} dups")

      // vacuum the superseded originals — the spool's hard links keep
      // the already-spooled batch readable regardless
      EventStore.vacuum(warehouse, "demo", "tap", graceMs = 0L)
      q.processAllAvailable()
      assert(ids().length == 100)

      // a fresh append AFTER the rewrite flows through exactly once
      EventStore.write(batch(2), warehouse, "demo", "tap")
      advance()
      q.processAllAvailable()
      assert(ids().length == 150 && ids().toSet == (0L until 150L).toSet,
        "post-compaction append lost or duplicated")
    } finally q.stop()
  }

  test("the spool fills from the head SNAPSHOT, so a tail created after " +
    "a compaction serves each historical row once, not per-rewrite-copy") {
    val warehouse = graft.TempDirs.scratch("graft-mtail2").toString
    (0 until 3).foreach(b => EventStore.write(batch(b), warehouse, "demo", "tap"))
    EventStore.compactPartition(spark, warehouse, "demo", "tap",
      month = "2026-03", rowsPerFile = 1_000_000L)
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val (stream, _) = Subscriptions.manifestStream(spark, schemaOf(), table, "late")
    val q = stream.writeStream.format("memory").queryName("mtail_late")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("mtail_late")
        .select("event_id").collect().map(_.getLong(0))
      assert(ids.length == 150 && ids.toSet == (0L until 150L).toSet)
    } finally q.stop()
  }

  test("erasure purges the forgotten user's rows from every spool — " +
    "hard links must not outlive deleteUser") {
    val warehouse = graft.TempDirs.scratch("graft-mtail3").toString
    EventStore.write(batch(0), warehouse, "demo", "tap")
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val spool = ManifestTail.spoolDir(table, "s")
    ManifestTail.advance(table, spool)
    def spoolFiles() = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
          if (f.isDirectory) walk(f) else Seq(f)
        }
      walk(spool).filter(_.getName.startsWith("part-"))
    }
    assert(spoolFiles().nonEmpty, "spool not filled")

    EventStore.deleteUser(spark, warehouse, "demo", "tap", "_user", "u1")
    // the erased partition's pre-rewrite files are gone from the spool
    // too (those links held the user's rows); only post-rewrite commits
    // would re-fill it, and erasure commits are rewrites — skipped
    assert(spoolFiles().isEmpty,
      s"spool still pins erased rows: ${spoolFiles().map(_.getName)}")
    // and the spool is POISONED: the stream may not have read the
    // purged files, so the next advance demands a recreate instead of
    // serving a silent gap
    val e = intercept[IllegalStateException] {
      ManifestTail.advance(table, spool)
    }
    assert(e.getMessage.contains("recreate the subscription"), e.getMessage)
    // a fresh subscription refills from the post-erasure snapshot
    val fresh = ManifestTail.spoolDir(table, "s2")
    ManifestTail.advance(table, fresh)
  }

  test("a spool that VANISHED under a live subscription (swept as " +
    "stale, deleted out-of-band) poisons instead of silently refilling " +
    "from the head snapshot — the refill would re-deliver compacted " +
    "rows under new paths") {
    val warehouse = graft.TempDirs.scratch("graft-mtail-van").toString
    EventStore.write(batch(0), warehouse, "demo", "tap")
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val spool = ManifestTail.spoolDir(table, "van")
    val v = ManifestTail.advance(table, spool)
    ManifestTail.drop(spool) // another gateway's sweep, an operator rm
    val e = intercept[IllegalStateException] {
      ManifestTail.advance(table, spool, expectAdvanced = Some(v))
    }
    assert(e.getMessage.contains("vanished"), e.getMessage)
    // the poison persists: even an expectation-free advance now fails
    // until the subscription is recreated (which drops the spool)
    val e2 = intercept[IllegalStateException] {
      ManifestTail.advance(table, spool)
    }
    assert(e2.getMessage.contains("recreate"), e2.getMessage)
    // a genuinely FRESH spool (no prior delivery) still snapshot-fills
    assert(ManifestTail.advance(table,
      ManifestTail.spoolDir(table, "van2")) == v)
  }

  test("a vanished spool that had delivered NOTHING (version 0) refills " +
    "without poisoning — there was nothing to re-deliver") {
    val table = graft.TempDirs.scratch("graft-mtail-van0").toString
    val spool = ManifestTail.spoolDir(table, "v0")
    assert(ManifestTail.advance(table, spool) == 0L) // no commits yet
    ManifestTail.drop(spool)
    assert(ManifestTail.advance(table, spool, expectAdvanced = Some(0L)) == 0L)
    assert(!new java.io.File(spool, "_poisoned").isFile,
      "a zero-delivery spool was poisoned on refill")
  }

  test("sweepStale reaps cold spools, spares heartbeating ones") {
    val warehouse = graft.TempDirs.scratch("graft-mtail-sweep").toString
    EventStore.write(batch(0), warehouse, "demo", "tap")
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val cold = ManifestTail.spoolDir(table, "cold")
    val live = ManifestTail.spoolDir(table, "live")
    ManifestTail.advance(table, cold)
    ManifestTail.advance(table, live)
    assert(new java.io.File(cold, "_version")
      .setLastModified(System.currentTimeMillis() - 48 * 3600 * 1000L))
    val n = ManifestTail.sweepStale(s"$warehouse/demo")
    assert(n == 1 && !cold.exists() && live.exists(),
      s"swept $n; cold=${cold.exists()} live=${live.exists()}")
    // an idle-but-polled tail heartbeats its marker on every advance
    assert(new java.io.File(live, "_version")
      .setLastModified(System.currentTimeMillis() - 48 * 3600 * 1000L))
    ManifestTail.advance(table, live) // no new commits — still touches
    assert(ManifestTail.sweepStale(s"$warehouse/demo") == 0 && live.exists(),
      "heartbeat did not protect an idle live tail")
  }

  test("randomized interleaving (seeded): appends, compactions and polls " +
    "in any order, vacuum after catch-up — every appended row delivered " +
    "exactly once") {
    val warehouse = graft.TempDirs.scratch("graft-mtail-rand").toString
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val rnd = new scala.util.Random(20260816L) // deterministic replay
    var nextBatch = 0
    def append(): Unit = {
      EventStore.write(batch(nextBatch, n = 20), warehouse, "demo", "tap")
      nextBatch += 1
    }
    append() // the stream source needs one file at creation
    val (stream, advance) =
      Subscriptions.manifestStream(spark, schemaOf(), table, "rand")
    val q = stream.writeStream.format("memory").queryName("mtail_rand")
      .outputMode("append").start()
    try {
      (0 until 24).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 | 1 => append()
          case 2 =>
            EventStore.compactPartition(spark, warehouse, "demo", "tap",
              month = "2026-03", rowsPerFile = 1_000_000L): Unit
        }
        if (rnd.nextBoolean()) { advance(); q.processAllAvailable() }
      }
      advance()
      q.processAllAvailable()
      def delivered() = spark.table("mtail_rand")
        .select("event_id").collect().map(_.getLong(0))
      val expected = (0L until nextBatch.toLong * 20).toSet
      val ids = delivered()
      assert(ids.length == expected.size && ids.toSet == expected,
        s"${nextBatch * 20} rows appended; tail delivered ${ids.length} " +
          s"(${ids.length - ids.toSet.size} duplicated, " +
          s"${(expected -- ids.toSet).size} lost)")
      // a vacuum AFTER the tail caught up is always safe (the spool's
      // hard links pin what was already served)
      EventStore.vacuum(warehouse, "demo", "tap",
        retainVersions = 1, graceMs = 0L)
      advance()
      q.processAllAvailable()
      assert(delivered().length == expected.size)
    } finally q.stop()
  }

  test("a tail lagging a compact+vacuum fails LOUDLY: an append-committed " +
    "file reaped before the tail spooled it is data loss, never a skip") {
    val warehouse = graft.TempDirs.scratch("graft-mtail5").toString
    EventStore.write(batch(0), warehouse, "demo", "tap")
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    val spool = ManifestTail.spoolDir(table, "lag")
    ManifestTail.advance(table, spool) // caught up through batch 0
    // batch 1 lands, is compacted away, and vacuum reaps its original
    // file — all before the tail's next advance
    EventStore.write(batch(1), warehouse, "demo", "tap")
    EventStore.compactPartition(spark, warehouse, "demo", "tap",
      month = "2026-03", rowsPerFile = 1_000_000L)
    EventStore.vacuum(warehouse, "demo", "tap", retainVersions = 1,
      graceMs = 0L)
    val e = intercept[IllegalStateException] {
      ManifestTail.advance(table, spool)
    }
    assert(e.getMessage.contains("vacuum retention"), e.getMessage)
  }

  test("prune ages links by spool-INSERTION time (hard links share the " +
    "source's publish mtime — aging by mtime would delete unprocessed " +
    "snapshot links) and refuses links above the processed-version fence") {
    val warehouse = graft.TempDirs.scratch("graft-mtail-prune").toString
    EventStore.write(batch(0), warehouse, "demo", "tap")
    val table = EventStore.tablePath(warehouse, "demo", "tap")
    // simulate an OLD table: the published part files' mtimes are long
    // in the past, so the spool's hard links will look ancient to any
    // mtime-based aging
    def tableParts(): Seq[java.io.File] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
          if (f.isDirectory && !f.getName.startsWith(".")) walk(f)
          else if (f.getName.startsWith("part-")) Seq(f) else Nil
        }
      walk(new java.io.File(table))
    }
    tableParts().foreach(f => assert(
      f.setLastModified(System.currentTimeMillis() - 30L * 24 * 3600 * 1000)))

    val spool = ManifestTail.spoolDir(table, "pr")
    val v1 = ManifestTail.advance(table, spool)
    def spoolParts(): Seq[java.io.File] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
          if (f.isDirectory) walk(f)
          else if (f.getName.startsWith("part-")) Seq(f) else Nil
        }
      walk(spool)
    }
    val n1 = spoolParts().size
    assert(n1 > 0)
    // a poll-lag-sized window prunes NOTHING: the links were inserted
    // milliseconds ago, whatever their shared inode mtime claims
    assert(ManifestTail.prune(spool, olderThanMs = 60_000L,
      upToVersion = v1) == 0)
    assert(spoolParts().size == n1, "mtime-aged pruning deleted fresh links")

    // new commits past the processed fence: their links are refused
    // even by a zero window
    EventStore.write(batch(1), warehouse, "demo", "tap")
    val v2 = ManifestTail.advance(table, spool)
    assert(v2 > v1)
    val n2 = spoolParts().size
    assert(n2 > n1)
    Thread.sleep(5)
    val prunedOld = ManifestTail.prune(spool, olderThanMs = 0L,
      upToVersion = v1)
    assert(prunedOld == n1, s"expected $n1 pruned, got $prunedOld")
    assert(spoolParts().size == n2 - n1,
      "version fence failed: links above upToVersion were deleted")
    // raising the fence to the drained version prunes the rest…
    assert(ManifestTail.prune(spool, 0L, upToVersion = v2) == n2 - n1)
    assert(spoolParts().isEmpty)
    // …and the tail keeps flowing: a later append links fresh files
    EventStore.write(batch(2), warehouse, "demo", "tap")
    ManifestTail.advance(table, spool)
    assert(spoolParts().nonEmpty, "pruned spool stopped linking new commits")
  }

  test("a tail that fell behind the vacuumed log window fails fast, " +
    "never silently skips (the failOnDataLoss contract)") {
    val table = graft.TempDirs.scratch("graft-mtail4").toString
    def touch(rel: String): Unit = {
      val f = new java.io.File(table, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, Array[Byte](1))
    }
    // commit v1, pin the spool there, then 17 more commits (crosses the
    // CheckpointEvery=16 boundary) and a vacuum that drops the log tail
    touch("_month=2026-01/part-a.parquet")
    TableManifest.commit(table, Seq("_month=2026-01/part-a.parquet"))
    val spool = ManifestTail.spoolDir(table, "stale")
    ManifestTail.advance(table, spool)
    (0 until 17).foreach { i =>
      val rel = f"_month=2026-01/part-b$i%02d.parquet"
      touch(rel)
      TableManifest.commit(table, Seq(rel))
    }
    TableManifest.vacuum(table, retainVersions = 1, graceMs = 0L)
    val e = intercept[IllegalStateException] {
      ManifestTail.advance(table, spool)
    }
    assert(e.getMessage.contains("vacuum retention window"), e.getMessage)
  }
}
