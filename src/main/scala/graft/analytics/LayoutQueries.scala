package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and profiling operators: how the data should be laid
  * out on disk, and what is actually in it — the two questions every
  * 100 TB ingest answers before the first analytical query runs. The
  * reference orders its event partitions by collect time alone
  * (ref rakam-postgresql/src/main/java/org/rakam/postgresql/analysis/
  * PostgresqlEventStore.java:61-118 — per-collection time-keyed
  * shards); a time-only sort leaves user-keyed scans unclustered, so
  * zo1 adds the standard multi-dimensional fix (Z-order / Morton
  * interleave) and makes its locality a measured, oracle-checked
  * quantity rather than a slogan.
  *
  * Scale posture (100 TB): zo1 is two scans (a 4-value bounds aggregate,
  * then one scan-side projection into a grouped count — no joins, the
  * 1-row bounds frame broadcasts). prof1 is ONE scan of the table:
  * Spark plans the n-distinct-columns aggregate as a single pass behind
  * an Expand (row ×(n+1) in the map stage, partial-agg'd before the
  * shuffle) — at true scale you drop the exact NDV column and serve the
  * sketch alone (the a5 discipline); the exact twin here is what makes
  * the sketch's error an oracle-checked quantity.
  */
object LayoutQueries {

  // ---------------- zo1: Z-order layout audit ----------------

  /** Bits per dimension: 10 → a 20-bit Morton code. */
  private val Bits = 10

  /** Bucket = top 8 bits of the code (≤256 buckets in the audit). */
  private val BucketShift = 12

  /** The Morton interleave as a SQL expression over normalized codes
    * `ux`/`tx`, generated per dialect (Spark spells shifts
    * `shiftleft`/`shiftright`; DuckDB uses `<<`/`>>`). Bit-disjoint
    * terms, so `+` is `|`. */
  private def mortonSpark: String =
    (0 until Bits).map { i =>
      s"(shiftleft(shiftright(ux, $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftright(tx, $i) & 1, ${2 * i}))"
    }.mkString(" + ")

  private def mortonDuck: String =
    (0 until Bits).map { i =>
      s"(((ux >> $i) & 1) << ${2 * i + 1}) + (((tx >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** ZO1: Z-order (Morton) layout audit over `events(user_id, ts)` —
    * interleave the two dimensions' 10-bit rank codes into one sort key
    * and report, per 8-bit code prefix ("file"), the row count and the
    * span of BOTH dimensions inside it. Under a time-only sort a
    * bucket's user span is the full user range; under the Z-order every
    * bucket is narrow in both — which is exactly the property that lets
    * parquet row-group min/max statistics prune scans for predicates on
    * EITHER column. The write path this audits is
    * [[zorderWrite]]: `repartitionByRange(zval)` +
    * `sortWithinPartitions(zval)`, so each output file covers one code
    * range and carries tight min/max on both dimensions.
    *
    * All arithmetic is 64-bit integer (rank, shift, mask): deterministic
    * and identical across engines — no doubles anywhere. */
  def zo1From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.select(
      $"user_id".as("u"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("um"))
    // 4-value bounds frame: broadcasts; +1 keeps the divisor nonzero and
    // the max element's code inside [0, 2^Bits).
    val bounds = e.agg(
      min($"u").as("umin"), max($"u").as("umax"),
      min($"um").as("tmin"), max($"um").as("tmax"))
    val coded = e.crossJoin(broadcast(bounds))
      .withColumn("ux", expr(s"((u - umin) * ${1 << Bits}) DIV (umax - umin + 1)"))
      .withColumn("tx", expr(s"((um - tmin) * ${1 << Bits}) DIV (tmax - tmin + 1)"))
      .withColumn("zval", expr(mortonSpark))
    coded
      .groupBy(expr(s"shiftright(zval, $BucketShift)").as("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        (max($"u") - min($"u")).as("u_span"),
        (max($"um") - min($"um")).as("t_span_us"))
  }

  def zo1ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    zo1From(Tables(spark, dir, "events"))

  val zo1Sql: String =
    s"""WITH b AS (
       |  SELECT min(user_id) AS umin, max(user_id) AS umax,
       |    min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
       |  FROM events),
       |c AS (
       |  SELECT user_id AS u, epoch_us(ts) AS um,
       |    ((user_id - umin) * ${1 << Bits}) // (umax - umin + 1) AS ux,
       |    ((epoch_us(ts) - tmin) * ${1 << Bits}) // (tmax - tmin + 1) AS tx
       |  FROM events, b),
       |z AS (SELECT u, um, $mortonDuck AS zval FROM c)
       |SELECT zval >> $BucketShift AS zbucket, count(*) AS n,
       |  max(u) - min(u) AS u_span, max(um) - min(um) AS t_span_us
       |FROM z GROUP BY 1""".stripMargin

  /** The write path zo1 audits: append the Morton key, range-partition
    * on it (contiguous code ranges per output task, AQE-balanced), sort
    * within partitions so every parquet row group covers a narrow code
    * rectangle, and drop the key — the layout survives in the file/row-
    * group min/max statistics of BOTH original columns. */
  def zorderWrite(events: DataFrame, numFiles: Int): DataFrame = {
    import events.sparkSession.implicits._
    val e = events
      .withColumn("u", $"user_id")
      .withColumn("um", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val bounds = e.agg(
      min($"u").as("umin"), max($"u").as("umax"),
      min($"um").as("tmin"), max($"um").as("tmax"))
    e.crossJoin(broadcast(bounds))
      .withColumn("ux", expr(s"((u - umin) * ${1 << Bits}) DIV (umax - umin + 1)"))
      .withColumn("tx", expr(s"((um - tmin) * ${1 << Bits}) DIV (tmax - tmin + 1)"))
      .withColumn("zval", expr(mortonSpark))
      .repartitionByRange(numFiles, $"zval")
      .sortWithinPartitions($"zval")
      .drop("u", "um", "ux", "tx", "zval", "umin", "umax", "tmin", "tmax")
  }

  // ---------------- prof1: single-scan column profile ----------------

  /** The profiled columns of `events`. */
  private val ProfCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** PROF1: per-column table profile — non-null count, null count,
    * exact NDV, and whether the HLL++ sketch estimate lands inside the
    * a5-style bound (5% or ±5). The quality gate every ingested source
    * passes before it joins the warehouse: null bursts, key-cardinality
    * drift, and enum-column explosions all surface here first.
    *
    * One scan: the six `count(DISTINCT col)`s plan as a single Expand
    * (each input row fans to one replica per distinct-column, partially
    * aggregated map-side before one shuffle) — not six scans of the
    * table. The sketch column rides the same pass. At 100 TB, serve the
    * sketch and drop the exact column; this shape is the audit that
    * certifies doing so. */
  def prof1From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val aggs = count(lit(1)).as("total") +: ProfCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        approx_count_distinct(col(c), 0.01).as(s"andv_$c"))
    }
    val wide = events.agg(aggs.head, aggs.tail: _*)
    val stackArgs =
      ProfCols.map(c => s"'$c', n_$c, ndv_$c, andv_$c").mkString(", ")
    wide
      .select(
        expr(s"stack(${ProfCols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, ndv, andv)"),
        $"total")
      .select(
        $"column_name",
        $"n_nonnull",
        ($"total" - $"n_nonnull").as("n_null"),
        $"ndv",
        (abs($"andv" - $"ndv") <= greatest($"ndv" * 0.05, lit(5.0)))
          .as("within_bound"))
  }

  def prof1ColumnStats(spark: SparkSession, dir: String): DataFrame =
    prof1From(Tables(spark, dir, "events"))

  val prof1Sql: String =
    ProfCols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS ndv,
         |  TRUE AS within_bound FROM events""".stripMargin
    }.mkString("\nUNION ALL\n")

  val defs: Seq[(String, QueryDef)] = Seq(
    "zo1_zorder_layout" -> QueryDef.of(zo1Sql)(zo1ZorderLayout),
    "prof1_column_stats" -> QueryDef.of(prof1Sql)(prof1ColumnStats)
  )
}
