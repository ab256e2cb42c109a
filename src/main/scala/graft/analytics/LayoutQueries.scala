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
  * 1-row bounds frame broadcasts). prof1 is TWO cheap scans joined as
  * 1-row frames: the exact-NDV pass (count buffers only behind the
  * multi-distinct Expand) and the sketch pass (one group, six HLL
  * buffers TOTAL — never one per distinct value; the naive
  * single-aggregate form carried all six p=14 (~16 KB) HLL++ buffers
  * through every Expand group and allocated GBs on a 2 MB input).
  * At true scale you run [[prof1Served]], which drops the exact column
  * entirely and keeps only the sketch pass.
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
  private def mortonSpark(ux: String, tx: String): String =
    (0 until Bits).map { i =>
      s"(shiftleft(shiftright($ux, $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftright($tx, $i) & 1, ${2 * i}))"
    }.mkString(" + ")

  private def mortonDuck: String =
    (0 until Bits).map { i =>
      s"(((ux >> $i) & 1) << ${2 * i + 1}) + (((tx >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** Overflow-safe rank normalization into [0, 2^Bits). The naive
    * `(u - umin) * 1024 DIV (range + 1)` silently wraps 64-bit
    * arithmetic (Spark is non-ANSI by default) as soon as the domain
    * spans more than 2^53 — exactly the snowflake-style id domains a
    * 100 TB table has — while the DuckDB twin ERRORS on the same
    * overflow: silent divergence precisely at scale. And plain
    * divide-first (`offset DIV (range DIV 1024 + 1)`) never overflows
    * but collapses resolution when the range is SMALLER than 2^Bits
    * (codes = raw offsets, upper Morton bits dead). So: pre-shrink the
    * offset by `w = (range DIV 2^52) + 1` — the identity for every
    * realistic range — then multiply-divide; the reduced offset is
    * < 2^52, so `reduced * 2^Bits < 2^62` can never wrap.
    *
    * Caller contract: `hi - lo` itself must not wrap — a domain
    * spanning more than the signed-64 range is impossible, but one
    * spanning MORE THAN HALF of it (hash-valued ids) makes the raw
    * subtraction negative. [[zorderWrite]] therefore halves numeric
    * keys (order-preserving, irrelevant at 10-bit code resolution);
    * zo1's oracle domain is the bounded testdata. */
  private val PreShrink = 1L << 52

  private def normSpark(v: String, lo: String, hi: String): String = {
    val w = s"((($hi - $lo) DIV $PreShrink) + 1)"
    s"((($v - $lo) DIV $w) * ${1 << Bits}) DIV ((($hi - $lo) DIV $w) + 1)"
  }

  private def normDuck(v: String, lo: String, hi: String): String = {
    val w = s"((($hi - $lo) // $PreShrink) + 1)"
    s"((($v - $lo) // $w) * ${1 << Bits}) // ((($hi - $lo) // $w) + 1)"
  }

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
    // 4-value bounds frame: broadcasts; the +1 in the width keeps the
    // divisor nonzero and the max element's code inside [0, 2^Bits).
    val bounds = e.agg(
      min($"u").as("umin"), max($"u").as("umax"),
      min($"um").as("tmin"), max($"um").as("tmax"))
    val coded = e.crossJoin(broadcast(bounds))
      .withColumn("ux", expr(normSpark("u", "umin", "umax")))
      .withColumn("tx", expr(normSpark("um", "tmin", "tmax")))
      .withColumn("zval", expr(mortonSpark("ux", "tx")))
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
       |    ${normDuck("user_id", "umin", "umax")} AS ux,
       |    ${normDuck("epoch_us(ts)", "tmin", "tmax")} AS tx
       |  FROM events, b),
       |z AS (SELECT u, um, $mortonDuck AS zval FROM c)
       |SELECT zval >> $BucketShift AS zbucket, count(*) AS n,
       |  max(u) - min(u) AS u_span, max(um) - min(um) AS t_span_us
       |FROM z GROUP BY 1""".stripMargin

  /** Scratch columns appended (and dropped) by [[zorderWrite]]. The
    * event schema evolves from arbitrary ingested JSON property names
    * (S1 infer+evolve), so the scratch names carry an engine-reserved
    * prefix and the write fails fast on the (pathological) collision
    * rather than silently destroying a user column. */
  private val ZoScratch = Seq("__zo_u", "__zo_um", "__zo_ux", "__zo_tx",
    "__zo_zval", "__zo_umin", "__zo_umax", "__zo_tmin", "__zo_tmax")

  /** The write path zo1 audits: append the Morton key, range-partition
    * on it (contiguous code ranges per output task, AQE-balanced), sort
    * within partitions so every parquet row group covers a narrow code
    * rectangle, and drop the key — the layout survives in the file/row-
    * group min/max statistics of BOTH original columns. Column names
    * are parameters because the store schema spells them `_user`/`_time`
    * (the testdata events table spells them `user_id`/`ts`). */
  def zorderWrite(events: DataFrame, numFiles: Int,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    import events.sparkSession.implicits._
    val clash = events.columns.toSet.intersect(ZoScratch.toSet)
    require(clash.isEmpty,
      s"zorderWrite scratch columns collide with event columns: $clash")
    // a non-numeric user key rank-normalizes via a 63-bit hash: locality
    // becomes same-key clustering (the point-lookup pattern a store
    // serves) rather than range clustering, and file min/max statistics
    // on the ORIGINAL string column still prune equality probes.
    // Numeric keys are halved (order-preserving): a domain spanning the
    // full signed-64 range (e.g. ids that are themselves 64-bit hashes)
    // would otherwise wrap `umax - umin` in normSpark's range — the one
    // subtraction its pre-shrink cannot protect; a 10-bit rank code
    // never misses the dropped LSB
    val ukey = events.schema(userCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        shiftright(col(userCol).cast("long"), 1)
      case _ => shiftrightunsigned(xxhash64(col(userCol)), 1)
    }
    val e = events
      .withColumn("__zo_u", ukey)
      .withColumn("__zo_um", expr(s"unix_micros(CAST($tsCol AS TIMESTAMP))"))
    val bounds = e.agg(
      min($"__zo_u").as("__zo_umin"), max($"__zo_u").as("__zo_umax"),
      min($"__zo_um").as("__zo_tmin"), max($"__zo_um").as("__zo_tmax"))
    e.crossJoin(broadcast(bounds))
      .withColumn("__zo_ux", expr(normSpark("__zo_u", "__zo_umin", "__zo_umax")))
      .withColumn("__zo_tx", expr(normSpark("__zo_um", "__zo_tmin", "__zo_tmax")))
      .withColumn("__zo_zval", expr(mortonSpark("__zo_ux", "__zo_tx")))
      .repartitionByRange(numFiles, $"__zo_zval")
      .sortWithinPartitions($"__zo_zval")
      .drop(ZoScratch: _*)
  }

  // ---------------- prof1: column profile ----------------

  /** The profiled columns of `events`. */
  private val ProfCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** One NDV sketch: DataSketches HLL (lgK=14 → rsd ≈ 0.8%) over the
    * column's 64-bit hash. The hash admits ANY column type (timestamp,
    * double, map — none directly sketchable) and is distinct-preserving
    * up to 2^-64 collision odds; the DataSketches aggregate keeps the
    * whole sketch in ONE binary buffer slot, where the classic
    * `approx_count_distinct(rsd=0.01)` explodes into ~2,700 long buffer
    * attributes PER SKETCH (16k-attribute schemas, multi-MB codegen —
    * seconds of fixed planning cost before any data moves). */
  private def sketchAgg(c: String): Column =
    hll_sketch_estimate(hll_sketch_agg(xxhash64(col(c)), lit(14)))
      .as(s"andv_$c")

  /** PROF1: per-column table profile — non-null count, null count,
    * exact NDV, and whether the HLL++ sketch estimate lands inside the
    * a5-style bound (5% or ±5). The quality gate every ingested source
    * passes before it joins the warehouse: null bursts, key-cardinality
    * drift, and enum-column explosions all surface here first.
    *
    * TWO passes, deliberately — never one: (1) the exact pass (counts +
    * six `count(DISTINCT col)`) plans as one Expand whose partial-agg
    * buffers are plain longs; (2) the sketch pass computes the six
    * [[sketchAgg]] HLL sketches in a single-group aggregate,
    * so exactly six ~16 KB sketches exist in the whole job. Fusing the
    * two into one aggregate makes `RewriteDistinctAggregates` carry all
    * six sketch buffers through EVERY (gid, distinct-value) group of
    * the Expand — tens of GB of buffer for a 2 MB input, measured at
    * ~100 s on 100k rows. The two 1-row frames meet in a broadcast
    * cross join (free). PlanSpec pins that no HLL aggregate ever sits
    * above an Expand again.
    *
    * Oracle note: the sketch estimate is engine-specific state the
    * DuckDB twin cannot reproduce, so the bound check rides two
    * columns. `within_bound` (twin: TRUE) is the verdict; `andv_oob`
    * carries the raw estimate ONLY when it broke the bound and is NULL
    * otherwise (twin: NULL) — green in the healthy case, and a bound
    * failure shows up in the mismatch report WITH the offending
    * estimate, distinguishable at a glance from a generic engine bug.
    * The 100 TB serving path is [[prof1Served]], which drops the
    * exact column entirely (the t_topk_served discipline); this exact
    * twin is the audit that certifies doing so. */
  def prof1From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val exactAggs = count(lit(1)).as("total") +: ProfCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"n_$c"),
        countDistinct(col(c)).as(s"ndv_$c"))
    }
    val exact = events.agg(exactAggs.head, exactAggs.tail: _*)
    val sketches = events.agg(sketchAgg(ProfCols.head),
      ProfCols.tail.map(sketchAgg): _*)
    val wide = exact.crossJoin(broadcast(sketches))
    val stackArgs =
      ProfCols.map(c => s"'$c', n_$c, ndv_$c, andv_$c").mkString(", ")
    wide
      .select(
        expr(s"stack(${ProfCols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, ndv, andv)"),
        $"total")
      .withColumn("within_bound",
        abs($"andv" - $"ndv") <= greatest($"ndv" * 0.05, lit(5.0)))
      .select(
        $"column_name",
        $"n_nonnull",
        ($"total" - $"n_nonnull").as("n_null"),
        $"ndv",
        $"within_bound",
        when($"within_bound", lit(null).cast("double"))
          .otherwise($"andv").as("andv_oob"))
  }

  def prof1ColumnStats(spark: SparkSession, dir: String): DataFrame =
    prof1From(Tables(spark, dir, "events"))

  val prof1Sql: String =
    ProfCols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS ndv,
         |  TRUE AS within_bound,
         |  CAST(NULL AS DOUBLE) AS andv_oob FROM events""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** PROF1-SERVED: the 100 TB profiler — the sketch pass ALONE. No
    * `count(DISTINCT)` anywhere, hence no Expand in the plan (pinned in
    * PlanSpec): one scan, one single-group partial-merged aggregate
    * holding exactly six HLL++ buffers, and per-column exact null
    * accounting riding the same pass as plain counts.
    *
    * The oracle-checked contract is the a5/a8 bound convention: the
    * exact columns (`n_nonnull`, `n_null`) hash-compare exactly, and
    * the sketch contributes two engine-agnostic sanity booleans —
    * `andv_positive` (a nonempty column estimates ≥ 1; an empty one
    * estimates 0) and `andv_le_rows` (the estimate never exceeds the
    * row count by more than the 5% bound slack). The sketch's PRECISION
    * (±5% of true NDV) is certified by the exact twin [[prof1From]],
    * which this variant exists to replace at scale. */
  def prof1ServedFrom(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val aggs = count(lit(1)).as("total") +: ProfCols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"), sketchAgg(c))
    }
    val wide = events.agg(aggs.head, aggs.tail: _*)
    val stackArgs =
      ProfCols.map(c => s"'$c', n_$c, andv_$c").mkString(", ")
    wide
      .select(
        expr(s"stack(${ProfCols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, andv)"),
        $"total")
      .select(
        $"column_name",
        $"n_nonnull",
        ($"total" - $"n_nonnull").as("n_null"),
        (($"n_nonnull" === 0 && $"andv" === 0) ||
          ($"n_nonnull" > 0 && $"andv" >= 1)).as("andv_positive"),
        ($"andv" <= ceil($"n_nonnull" * 1.05).cast("long") + lit(5L))
          .as("andv_le_rows"))
  }

  def prof1Served(spark: SparkSession, dir: String): DataFrame =
    prof1ServedFrom(Tables(spark, dir, "events"))

  val prof1ServedSql: String =
    ProfCols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
         |  count(*) - count($c) AS n_null,
         |  TRUE AS andv_positive, TRUE AS andv_le_rows FROM events""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** PROF2: column-profile DRIFT between the table's two time halves —
    * the monitoring gate between ingest snapshots: a null burst, a
    * key-cardinality collapse, or an enum explosion in the NEW data
    * surfaces as a per-column drift row before the batch joins the
    * warehouse. Segment = event time below/above the midpoint of the
    * table's time range (deterministic, engine-identical integer
    * arithmetic; micros magnitudes sit far below the 2^53 overflow
    * line, so the ×2 midpoint comparison is exact in both engines).
    *
    * ONE scan: per-column segment counts ride a conditional aggregate
    * (`count(CASE WHEN seg THEN col END)`, `count(DISTINCT CASE …)`);
    * the multi-distinct Expand carries long buffers only — the prof1
    * discipline. Drift metrics are exact (no sketches), so the DuckDB
    * twin checks every value; at true scale the serving path is
    * [[prof1ServedFrom]] per segment with sketch NDVs, and this exact
    * form remains the audit. `drifted` flags |null-rate shift| > 0.1 or
    * an NDV ratio outside [0.5, 2]. */
  def prof2From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    // profile whichever of the standard columns the frame carries — the
    // facade convention (a caller's frame may lack e.g. props)
    val profCols = ProfCols.filter(events.columns.contains)
    val e = events.withColumn("__um",
      expr("unix_micros(CAST(ts AS TIMESTAMP))"))
    val bounds = e.agg(
      min($"__um").as("__tmin"), max($"__um").as("__tmax"))
    val seg = ($"__um" - $"__tmin") * 2 < ($"__tmax" - $"__tmin")
    val withSeg = e.crossJoin(broadcast(bounds)).withColumn("__a", seg)
    // Expand-width bound (r18, guide §2.3/§5; r17 verdict #6): the flat
    // 12-countDistinct aggregate planned ONE Expand of 13 projections —
    // every input row multiplied 13× before the partial agg. Grouping by
    // the segment flag instead halves the distinct-agg count (one
    // countDistinct per column, not per column×segment), and splitting
    // the columns into two batches bounds each pass's Expand at 4
    // projections (3 distinct-arg groups + 1 regular — pinned in
    // PlanSpec). Each batch scans only its own columns (columnar
    // pruning), the ≤3-row grouped frames pivot in a free second
    // aggregate, and the 1-row batch results meet in a broadcast cross
    // join (the prof1 exact/sketch discipline). Rows with NULL ts fall
    // in neither segment in both forms (`when` skips null predicates;
    // the null-flag group is excluded by the === pivots).
    def widePass(cols: Seq[String], withTotals: Boolean): DataFrame = {
      val gAggs = count(lit(1)).as("grp_total") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"n_$c"),
          countDistinct(col(c)).as(s"nd_$c"))
      }
      val g = withSeg.groupBy($"__a").agg(gAggs.head, gAggs.tail: _*)
      def side(a: Boolean, c: Column): Column =
        coalesce(sum(when($"__a" === a, c)), lit(0L))
      val pivots =
        (if (withTotals)
          Seq(side(a = true, $"grp_total").as("total_a"),
            side(a = false, $"grp_total").as("total_b"))
        else Seq.empty[Column]) ++
          cols.flatMap { c =>
            Seq(side(a = true, col(s"n_$c")).as(s"na_$c"),
              side(a = true, col(s"nd_$c")).as(s"nda_$c"),
              side(a = false, col(s"n_$c")).as(s"nb_$c"),
              side(a = false, col(s"nd_$c")).as(s"ndb_$c"))
          }
      g.agg(pivots.head, pivots.tail: _*)
    }
    val batches =
      profCols.grouped(math.max(1, (profCols.size + 1) / 2)).toSeq
    val wide = batches.zipWithIndex
      .map { case (cols, i) => widePass(cols, i == 0) }
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    val stackArgs =
      profCols.map(c => s"'$c', na_$c, nda_$c, nb_$c, ndb_$c").mkString(", ")
    val ratio = $"ndv_b".cast("double") / nullif($"ndv_a", lit(0)).cast("double")
    wide
      .select(
        expr(s"stack(${profCols.size}, $stackArgs) AS " +
          "(column_name, n_a, ndv_a, n_b, ndv_b)"),
        $"total_a", $"total_b")
      .select(
        $"column_name",
        $"n_a", $"n_b", $"ndv_a", $"ndv_b",
        (($"total_a" - $"n_a").cast("double") / $"total_a".cast("double"))
          .as("null_rate_a"),
        (($"total_b" - $"n_b").cast("double") / $"total_b".cast("double"))
          .as("null_rate_b"),
        ratio.as("ndv_ratio"))
      .withColumn("drifted",
        (abs($"null_rate_a" - $"null_rate_b") > 0.1) ||
          !coalesce($"ndv_ratio".between(0.5, 2.0), lit(false)))
  }

  def prof2Drift(spark: SparkSession, dir: String): DataFrame =
    prof2From(Tables(spark, dir, "events"))

  val prof2Sql: String = {
    val perCol = ProfCols.map { c =>
      s"""SELECT '$c' AS column_name,
         |  count(CASE WHEN a THEN $c END) AS n_a,
         |  count(DISTINCT CASE WHEN a THEN $c END) AS ndv_a,
         |  count(CASE WHEN NOT a THEN $c END) AS n_b,
         |  count(DISTINCT CASE WHEN NOT a THEN $c END) AS ndv_b,
         |  count(CASE WHEN a THEN 1 END) AS total_a,
         |  count(CASE WHEN NOT a THEN 1 END) AS total_b
         |FROM seg""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
       |  FROM events),
       |seg AS (
       |  SELECT events.*,
       |    (epoch_us(ts) - tmin) * 2 < (tmax - tmin) AS a
       |  FROM events, b),
       |w AS (
       |$perCol)
       |SELECT column_name, n_a, n_b, ndv_a, ndv_b,
       |  CAST(total_a - n_a AS DOUBLE) / total_a AS null_rate_a,
       |  CAST(total_b - n_b AS DOUBLE) / total_b AS null_rate_b,
       |  CAST(ndv_b AS DOUBLE) / nullif(ndv_a, 0) AS ndv_ratio,
       |  (abs(CAST(total_a - n_a AS DOUBLE) / total_a -
       |       CAST(total_b - n_b AS DOUBLE) / total_b) > 0.1)
       |    OR NOT coalesce(
       |      CAST(ndv_b AS DOUBLE) / nullif(ndv_a, 0) BETWEEN 0.5 AND 2.0,
       |      FALSE) AS drifted
       |FROM w""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "zo1_zorder_layout" -> QueryDef.of(zo1Sql)(zo1ZorderLayout),
    "prof1_column_stats" -> QueryDef.of(prof1Sql)(prof1ColumnStats),
    "prof1_served" -> QueryDef.of(prof1ServedSql)(prof1Served),
    "prof2_drift" -> QueryDef.of(prof2Sql)(prof2Drift)
  )
}
