package graft.store

import graft.core.SchemaRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar event store (S8's Spark restatement): append-only parquet
  * partitioned by `_month` derived from `_time` — the reference's
  * monthly range partitions (PostgresqlEventStore.java:149-158,
  * PostgresqlMetastore.java:310-311) become directory partitions, so
  * time-range queries prune at the source (dynamic partition pruning).
  * Partition creation is implicit in Spark — the retry dance the
  * reference does on constraint violations disappears.
  *
  * Source-only trigger fields (`_ip`, `_user_agent`, …) are dropped
  * before persist (P1, PostgresqlEventStore.java:362-373).
  *
  * Reads align files written under older schemas to the current
  * registry schema (missing columns null-filled — the unionByName
  * semantics of additive evolution).
  */
object EventStore {

  /** Magic source fields excluded from the persisted row (P1). */
  val sourceOnlyFields: Seq[String] = Seq("_ip", "_user_agent", "_referrer")

  /** The collection's table directory — the streaming tail
    * ([[graft.streaming.Subscriptions.fileStream]]) reads it as a
    * file source: every appended batch's files become a micro-batch. */
  def tablePath(warehouse: String, project: String, collection: String): String =
    s"$warehouse/$project/$collection"

  /** Append a typed batch; `_month` derived from `_time` when present. */
  def write(df: DataFrame, warehouse: String, project: String,
      collection: String): Unit = {
    val dropped = df.drop(sourceOnlyFields: _*)
    // a batch whose events carry no fields at all has nothing storable:
    // partitioning by _month alone would make EVERY column a partition
    // column, which Spark rejects with an AnalysisException that would
    // surface as a 500 from the collect door
    if (dropped.columns.isEmpty) return
    val withMonth =
      if (dropped.columns.contains("_time"))
        dropped.withColumn("_month", date_format(col("_time"), "yyyy-MM"))
      else dropped.withColumn("_month", lit("unknown"))
    withMonth.write.mode("append")
      .partitionBy("_month")
      .parquet(tablePath(warehouse, project, collection))
  }

  /** Read back aligned to the registry's current schema: files written
    * before an evolution lack the new columns; mergeSchema unions file
    * footers and the final select null-fills anything still missing
    * and fixes column order. */
  def read(spark: SparkSession, registry: SchemaRegistry, warehouse: String,
      project: String, collection: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(tablePath(warehouse, project, collection))
    registry.schema(project, collection) match {
      case None => df
      case Some(fields) =>
        val cols = fields.map { f =>
          if (df.columns.contains(f.name)) col(f.name).cast(f.tpe.spark).as(f.name)
          else lit(null).cast(f.tpe.spark).as(f.name)
        } :+ col("_month") // partition column rides along for pruning
        df.select(cols: _*)
    }
  }

  /** Single-job batch fan-out: a unified batch (from
    * JsonIngest.ingestUnified, `_collection` + union-of-schemas columns)
    * written once, partitioned by (collection, month) — one Spark job
    * regardless of how many collections the batch carries. At 100 TB this
    * is the difference between C full scans of the batch and one. */
  def writeUnified(unified: DataFrame, warehouse: String, project: String): Unit = {
    val withMonth =
      if (unified.columns.contains("_time"))
        unified.withColumn("_month",
          coalesce(date_format(col("_time"), "yyyy-MM"), lit("unknown")))
      else unified.withColumn("_month", lit("unknown"))
    withMonth.drop(sourceOnlyFields: _*)
      .write.mode("append")
      .partitionBy("_collection", "_month")
      .parquet(s"$warehouse/$project/events")
  }

  /** Read one collection out of the unified layout: partition pruning on
    * `_collection` keeps the scan to that collection's files; the select
    * restores the collection's registered columns (un-mangling unified
    * conflict columns, null-filling post-evolution additions). */
  def readUnified(spark: SparkSession, registry: SchemaRegistry,
      warehouse: String, project: String, collection: String): DataFrame = {
    val df = spark.read.option("mergeSchema", "true")
      .parquet(s"$warehouse/$project/events")
      .filter(col("_collection") === collection)
    registry.schema(project, collection) match {
      case None => df
      case Some(fields) =>
        val present = df.columns.toSet
        val cols = fields.map { f =>
          // the same formula writeUnified's data was produced with — reuse
          // it so the mangling scheme cannot drift between writer and reader
          val mangled = graft.ingest.JsonIngest.unifiedColumnName(
            f.name, f.tpe.name, conflicted = Set(f.name))
          // a field can exist under both names when only some batches had a
          // cross-collection type conflict — coalesce the candidates
          val candidates = Seq(f.name, mangled).filter(present.contains)
            .map(c => col(c).cast(f.tpe.spark))
          val src = if (candidates.isEmpty) lit(null).cast(f.tpe.spark)
            else if (candidates.size == 1) candidates.head
            else coalesce(candidates: _*)
          src.as(f.name)
        } :+ col("_month")
        df.select(cols: _*)
    }
  }

  /** Dead-letter append (S14): `$invalid_schema` table per project. */
  def writeDeadLetter(dead: DataFrame, warehouse: String, project: String): Unit =
    dead.write.mode("append")
      .parquet(s"$warehouse/$project/invalid_schema")

  /** Small-files compaction — the maintenance job an append-only
    * micro-batch store needs at scale: every ingest batch appends at
    * least one file per touched partition, so a month accumulates
    * thousands of KB-sized files and scan task scheduling (plus
    * footer reads) comes to dominate query time. Rewrites one
    * partition's files into `ceil(rows / rowsPerFile)` files and swaps
    * the directory atomically-enough for a single-writer store (write
    * aside, delete, rename). Runs per-partition so a 100 TB table
    * compacts incrementally, month by month, without a full rewrite.
    *
    * `zorderBy = Some((userCol, timeCol))` makes the rewrite also
    * RE-CLUSTER the partition on the Morton interleave of the two
    * columns ([[graft.analytics.LayoutQueries.zorderWrite]]): each
    * output file then covers a narrow rectangle in BOTH dimensions, so
    * parquet row-group min/max statistics prune scans for predicates on
    * either — compaction is the natural (and only) moment the store
    * pays that sort. zo1 is the audit of the layout this produces. */
  def compactPartition(spark: SparkSession, warehouse: String,
      project: String, collection: String, month: String,
      rowsPerFile: Long = 1_000_000L,
      zorderBy: Option[(String, String)] = None): Int = {
    val dir = s"${tablePath(warehouse, project, collection)}/_month=$month"
    val src = new java.io.File(dir)
    require(src.isDirectory, s"no such partition: $dir")
    val df = spark.read.parquet(dir)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val compacted = zorderBy match {
      case Some((userCol, timeCol)) =>
        graft.analytics.LayoutQueries.zorderWrite(df, files, userCol, timeCol)
      case None => df.coalesce(files)
    }
    val tmp = new java.io.File(s"$dir.compacting")
    compacted.write.mode("overwrite").parquet(tmp.getAbsolutePath)
    swapDir(tmp, src)
    files
  }

  /** Single-writer write-aside swap: the store is append-only and
    * rewrites are maintenance-window jobs (the reference's stores
    * assume the same). */
  private def swapDir(tmp: java.io.File, dst: java.io.File): Unit = {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(dst)
    require(tmp.renameTo(dst), s"rename failed: $tmp -> $dst")
  }

  /** Right-to-be-forgotten: physically remove one user's events from a
    * collection. Partitions are surveyed first and only those actually
    * containing the user are rewritten (for most users that is a
    * handful of months, not the table); each rewrite is the same
    * write-aside swap as compaction. Returns (partitions rewritten,
    * rows deleted). The profile side is the op-log's job: append an
    * unset-all tombstone and the merge folds the profile away. */
  def deleteUser(spark: SparkSession, warehouse: String, project: String,
      collection: String, userCol: String, userId: Any): (Int, Long) = {
    val root = new java.io.File(tablePath(warehouse, project, collection))
    // a collection declared (schema/add) but never stored has no table
    // dir — and trivially zero rows of the user to delete
    if (!root.isDirectory) return (0, 0L)
    val parts = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("_month="))
    var rewritten = 0
    var deleted = 0L
    parts.foreach { part =>
      val df = spark.read.parquet(part.getAbsolutePath)
      val hits = df.filter(col(userCol) === lit(userId)).count()
      if (hits > 0) {
        val keep = df.filter(!(col(userCol) <=> lit(userId)))
        val tmp = new java.io.File(s"${part.getAbsolutePath}.deleting")
        keep.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        swapDir(tmp, part)
        rewritten += 1
        deleted += hits
      }
    }
    (rewritten, deleted)
  }
}
