package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for the event store — multi-column
  * data skipping at rest.
  *
  * The store's directory partitioning prunes on `_month` (and
  * `_collection`), but WITHIN a partition the reference's row order is
  * arrival order, so a predicate on any other column (user, value,
  * country) overlaps every file's min/max stats and nothing skips.
  * Interleaving the bits of several columns' scaled ranks into one sort
  * key clusters rows so each written file covers a small hyper-rectangle
  * of the key space: parquet footer min/max become tight in EVERY
  * clustered dimension at once, and the scan's pushed filters skip whole
  * row groups / files (ZOrderSpec measures exactly this). This is the
  * layout trick of Delta OSS `OPTIMIZE ZORDER BY` / Iceberg sort orders,
  * built here from public Spark primitives: one stats pass, one
  * `repartitionByRange` + `sortWithinPartitions` on the interleaved key.
  *
  * Rank source is min-max scaling — one cheap agg pass, fully
  * deterministic. Heavy skew in a clustered column concentrates ranks
  * (production systems swap in range-partition ids or quantile ranks for
  * that; the interleave and write path are identical), which costs
  * skipping efficiency, never correctness: the z key only orders rows.
  *
  * Relationship to the layout-audit family: this is the GENERAL
  * n-column clustering utility (double-rank scaling, any numeric
  * columns). [[graft.analytics.LayoutQueries.zorderWrite]] is its
  * 2-column (user, time) INTEGER-EXACT twin whose code assignment the
  * zo1 oracle query reproduces bit-for-bit in DuckDB — that twin is
  * what [[EventStore.compactPartition]]'s `zorderBy` runs, so the
  * store's compacted layout is the one the audit measures.
  */
object ZOrder {

  /** Bits per column in the interleaved key (16 bits × 2 cols = 32-bit
    * z values; up to 3 cols stays within a long at 20 bits each). */
  val DefaultBits = 16

  /** Per-column (min, max) in double space — the one stats pass. */
  def stats(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      c -> ((row.getAs[Double](s"__mn_$c"), row.getAs[Double](s"__mx_$c")))
    }.toMap
  }

  /** The interleaved key: each column scales to a `bits`-bit rank, then
    * rank bits interleave column-round-robin from the most significant
    * down — pure integer Column arithmetic, codegen'd, no UDF. */
  def zvalue(colStats: Map[String, (Double, Double)], cols: Seq[String],
      bits: Int = DefaultBits): Column = {
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"${cols.size} cols × $bits bits must fit in a long")
    val topRank = (1L << bits) - 1
    val ranks = cols.map { c =>
      val (mn, mx) = colStats(c)
      val span = if (mx > mn) mx - mn else 1.0
      // clamp handles rows outside the stats sample and NaN→0
      least(greatest(
        nanvl((col(c).cast("double") - mn) / span, lit(0.0)) * topRank,
        lit(0.0)), lit(topRank.toDouble)).cast("long")
    }
    val n = cols.size
    val terms = for {
      b <- (bits - 1) to 0 by -1
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, b).bitwiseAND(lit(1L)),
      b * n + (n - 1 - i))
    terms.reduce(_ + _)
  }

  /** Cluster `df` into `numFiles` z-ordered buckets: range-partition on
    * the z key (so bucket k holds a contiguous z range → a small
    * hyper-rectangle per file), sort within each, drop the key. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = DefaultBits): DataFrame = {
    val z = zvalue(stats(df, cols), cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Cluster and write parquet — the `OPTIMIZE ZORDER BY` moment, run at
    * compaction time on a partition's worth of files. */
  def write(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = DefaultBits): Unit =
    cluster(df, cols, numFiles, bits).write.mode("overwrite").parquet(path)
}
