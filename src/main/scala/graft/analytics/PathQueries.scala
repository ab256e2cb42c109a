package graft.analytics

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral path analytics on the event stream: where users go next,
  * which touchpoint gets credit for a conversion, and how an experiment
  * split performs — the reference's event-explorer / funnel family
  * extended to the path level (ref rakam/src/main/java/org/rakam/
  * analysis/EventExplorerHttpService.java drives the same grouped
  * event-sequence questions through its backend SQL).
  *
  * Scale posture (100 TB): every operator here is one shuffle on
  * user_id followed by per-user window work (events are naturally
  * user-partitionable), then a small aggregate. No self-joins: nexts
  * and prior touches come from lead/last-over-window within the one
  * partition pass.
  */
object PathQueries {

  /** Deterministic per-user event order: ts then event_id (unique). */
  private def userOrder = Seq(col("ts"), col("event_id"))

  // ---------------- A14: next-event transition matrix ----------------

  /** A14: Markov transition matrix over per-user event sequences —
    * count and probability of each (event_type → next event_type) step.
    * One window pass (lead) per user partition, then a grouped count;
    * p is a per-row integer division, deterministic on both engines. */
  /** The a14 core over any event frame in the standard shape
    * (user_id, ts, event_id, event_type). */
  def a14From(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy(userOrder: _*)
    val steps = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
    val fromTotals = Window.partitionBy($"from_type")
    steps
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", $"n".cast("double") / sum($"n").over(fromTotals))
  }

  def a14EventPaths(spark: SparkSession, dir: String): DataFrame =
    a14From(Tables(spark, dir, "events"))

  val a14Sql: String =
    """WITH steps AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |counts AS (
      |  SELECT from_type, to_type, count(*) AS n FROM steps
      |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type) AS p
      |FROM counts""".stripMargin

  // ---------------- A15: last-touch attribution ----------------

  /** Attribution window: a conversion credits a touch at most this many
    * days before it. */
  private val AttrWindowDays = 7

  /** A15: last-touch conversion attribution — each purchase credits the
    * most recent preceding non-purchase event by the same user within
    * [[AttrWindowDays]] days (or "(none)"). The prior touch is carried
    * by `last(..., ignoreNulls)` over a frame ending one row before the
    * current — the as-of shape as a single window pass, no self-join —
    * and the credited value goes through the exact-decimal sum. */
  /** The a15 core over any event frame in the standard shape
    * (user_id, ts, event_id, event_type, value), parameterized by the
    * conversion event and the attribution window. */
  def a15From(events: DataFrame, conversionType: String = "purchase",
      windowDays: Int = AttrWindowDays): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy(userOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        last(when($"event_type" =!= conversionType,
          struct($"ts".as("t_ts"), $"event_type".as("t_type"))),
          ignoreNulls = true).over(w))
      .filter($"event_type" === conversionType)
      .withColumn("touch_type",
        when($"touch".isNotNull &&
          $"touch.t_ts" >= $"ts" - expr(s"INTERVAL $windowDays DAYS"),
          $"touch.t_type").otherwise(lit("(none)")))
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_conversions"),
        dsum($"value").as("attributed_value"))
  }

  def a15Attribution(spark: SparkSession, dir: String): DataFrame =
    a15From(Tables(spark, dir, "events"))

  val a15Sql: String =
    s"""WITH touched AS (
       |  SELECT event_type, ts, value,
       |    last_value(CASE WHEN event_type <> 'purchase'
       |        THEN {'t_ts': ts, 't_type': event_type} END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
       |  FROM events),
       |conv AS (
       |  SELECT value,
       |    CASE WHEN touch IS NOT NULL
       |        AND touch['t_ts'] >= ts - INTERVAL $AttrWindowDays DAY
       |      THEN touch['t_type'] ELSE '(none)' END AS touch_type
       |  FROM touched WHERE event_type = 'purchase')
       |SELECT touch_type, count(*) AS n_conversions,
       |  ${sqlDsum("value")} AS attributed_value
       |FROM conv GROUP BY touch_type""".stripMargin

  // ---------------- A16: A/B experiment readout ----------------

  /** A16: experiment readout for a deterministic 50/50 user split
    * (variant = user-id hash parity — the same stable bucketing a real
    * assignment service persists): per-variant exposed users,
    * converters, conversion rate, revenue per user, and the two-
    * proportion z statistic of the rate difference. The z arithmetic is
    * fixed-order scalar double math — IEEE-identical across engines.
    *
    * One lineage, one `events` scan: the per-variant frame is 2 rows, so
    * the cross-variant na/ca/nb/cb are lifted by a whole-frame window
    * (single-partition over 2 rows — trivially cheap) instead of two
    * filtered re-aggregations of the same subplan. */
  def a16AbTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perUser = Tables(spark, dir, "events")
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("converted"),
        sum(when($"event_type" === "purchase", $"value".cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
          .otherwise(lit(0).cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))).as("revenue"))
      .withColumn("variant",
        (DedupQueries.hash60($"user_id".cast("string")) % 2).cast("int"))
    val byVariant = perUser
      .groupBy($"variant")
      .agg(count(lit(1)).as("n_users"),
        sum($"converted").as("n_converters"),
        sum($"revenue").cast("double").as("revenue"))
      .withColumn("conv_rate", $"n_converters".cast("double") / $"n_users")
      .withColumn("revenue_per_user", $"revenue" / $"n_users")
    val wAll = Window.partitionBy()
    byVariant
      .withColumn("na", max(when($"variant" === 0, $"n_users")).over(wAll))
      .withColumn("ca", max(when($"variant" === 0, $"n_converters")).over(wAll))
      .withColumn("nb", max(when($"variant" === 1, $"n_users")).over(wAll))
      .withColumn("cb", max(when($"variant" === 1, $"n_converters")).over(wAll))
      .withColumn("pool", ($"ca" + $"cb").cast("double") / ($"na" + $"nb"))
      // z is undefined when the pooled rate is 0 or 1 (denominator √0) —
      // e.g. every exposed user converted — so guard to NULL, not a
      // divide-by-zero (ANSI mode throws; the oracle must agree).
      .withColumn("zden",
        sqrt($"pool" * (lit(1.0) - $"pool") *
          (lit(1.0) / $"na" + lit(1.0) / $"nb")))
      .withColumn("z",
        when($"zden" > 0,
          (($"ca".cast("double") / $"na") - ($"cb".cast("double") / $"nb")) /
            $"zden"))
      .select($"variant", $"n_users", $"n_converters", $"conv_rate",
        $"revenue", $"revenue_per_user", $"z")
  }

  val a16Sql: String =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
       |    sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(value AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS revenue,
       |    ${DedupQueries.sqlHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant
       |  FROM events GROUP BY user_id),
       |by_variant AS (
       |  SELECT CAST(variant AS INTEGER) AS variant,
       |    count(*) AS n_users,
       |    CAST(sum(converted) AS BIGINT) AS n_converters,
       |    CAST(sum(converted) AS DOUBLE) / count(*) AS conv_rate,
       |    CAST(sum(revenue) AS DOUBLE) AS revenue
       |  FROM per_user GROUP BY variant),
       |ab AS (
       |  SELECT
       |    (SELECT n_users FROM by_variant WHERE variant = 0) AS na,
       |    (SELECT n_converters FROM by_variant WHERE variant = 0) AS ca,
       |    (SELECT n_users FROM by_variant WHERE variant = 1) AS nb,
       |    (SELECT n_converters FROM by_variant WHERE variant = 1) AS cb),
       |zd AS (
       |  SELECT *, sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
       |      * (1.0 - (CAST(ca + cb AS DOUBLE) / (na + nb)))
       |      * (1.0 / na + 1.0 / nb)) AS zden
       |  FROM ab)
       |SELECT variant, n_users, n_converters, conv_rate, revenue,
       |  revenue / n_users AS revenue_per_user,
       |  CASE WHEN zden > 0 THEN
       |    ((CAST(ca AS DOUBLE) / na) - (CAST(cb AS DOUBLE) / nb)) / zden
       |  END AS z
       |FROM by_variant, zd""".stripMargin

  // ---------------- A3: ingest metrics ----------------

  /** A3: per-collection ingest metrics — the reference counts ingested
    * events per project as a first-class metric (SURVEY §2.4 A3); here
    * each collection reports volume, distinct users, payload bytes, and
    * its time span in one partial-agg'd pass. */
  def a3IngestMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type".as("collection"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum(length($"props").cast("long")).as("payload_bytes"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"))
  }

  val a3Sql: String =
    """SELECT event_type AS collection, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(len(props)) AS BIGINT) AS payload_bytes,
      |  min(ts) AS first_ts, max(ts) AS last_ts
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------- A22: Markov removal-effect attribution ----------------

  /** Absorption-recursion depth: the metric is DEFINED as the
    * [[MarkovSteps]]-step truncated conversion probability — a fixed,
    * engine-mirrorable recursion rather than a solve-to-convergence
    * whose stopping point would be float-dependent. A journey longer
    * than 12 touchpoints contributes through its first 12. */
  val MarkovSteps = 12

  /** The conversion event and the virtual states. Parenthesized so no
    * ingested event type can collide. */
  private val ConvType = "purchase"
  private val StartState = "(start)"
  private val ConvState = "(conv)"

  /** Journey-grained transition counts: per user, journeys split AT
    * conversions (a purchase ends its journey; later events start a
    * fresh one), virtual [[StartState]] opens every journey, a
    * converting journey ends in [[ConvState]], a dangling one just
    * ends (the NULL absorber needs no row — its conversion
    * contribution is zero). */
  private def journeyTransitions(events: DataFrame,
      convType: String): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy(userOrder: _*)
    val tagged = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      // journey id = number of STRICTLY EARLIER conversions
      .withColumn("jid",
        sum(when(lag($"event_type", 1).over(w) === convType, 1L)
          .otherwise(0L)).over(w))
    val jw = Window.partitionBy($"user_id", $"jid").orderBy(userOrder: _*)
    val steps = tagged
      .withColumn("from_state",
        coalesce(lag($"event_type", 1).over(jw), lit(StartState)))
      .withColumn("to_state",
        when($"event_type" === convType, ConvState)
          .otherwise($"event_type"))
    steps
      .groupBy($"from_state", $"to_state")
      .agg(count(lit(1)).as("n"))
  }

  /** A22: data-driven (Markov removal-effect) attribution — the
    * upgrade over a15's last-touch rule: estimate a first-order
    * journey chain (START → touchpoints → CONV, split at
    * conversions), compute the [[MarkovSteps]]-truncated probability
    * of reaching CONV from START, and credit each channel by how much
    * that probability DROPS when journeys passing through it are cut
    * (transitions into the channel redirected to the null absorber,
    * i.e. dropped — row totals keep the original denominator, so the
    * lost mass converts nothing, which is the standard removal
    * semantics). Output per channel: the removal effect
    * (1 − p_removed/p_base, floored at 0) and its normalized
    * attribution share.
    *
    * Scale posture: the event-side work is ONE window pass + one
    * grouped count (the a14 shape); everything after lives on the
    * |event-type-enum|²-bounded transition matrix, which the driver
    * collects (bounded — the sq2-vocabulary argument) and recurses
    * over locally with [[dec6]] quantization per term, bit-identical
    * to the SQL twin's staged [[dsum]] aggregates. */
  /** The exact mirror of [[dsum]]'s per-term quantization for the
    * driver-side recursion: Spark's double→DECIMAL(38,6) cast goes
    * through `BigDecimal.valueOf` (canonical shortest string), then
    * HALF_UP at scale 6 — summing the quantized terms exactly makes
    * the total order-insensitive, which is what lets a driver loop be
    * bit-identical to the engines' grouped aggregate. */
  private def dec6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)

  def a22From(events: DataFrame,
      convType: String = ConvType): DataFrame = {
    import events.sparkSession.implicits._
    val trans = journeyTransitions(events, convType)
    val probs = trans.withColumn("p",
      $"n".cast("double") /
        sum($"n").over(Window.partitionBy($"from_state")))
    // The matrix is |event-type enum|²-bounded — a BOUNDED driver
    // collect (the sq2-vocabulary argument), and the right split of
    // labor: the cluster does the data work (one window pass + one
    // grouped count over the corpus), the driver runs the
    // 12-iteration recursion over ≤ a few dozen doubles. Keeping the
    // recursion in the plan was measured at 3.3-27 s of pure
    // stage/planning overhead for the same arithmetic.
    val t = probs.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    // the virtual states are engine-reserved: a REAL ingested event
    // type spelled like one would silently corrupt the chain (merge
    // with the start state, count as a conversion, or collide with
    // the SQL twin's base-variant label) — fail loudly instead.
    // A real "(conv)"/"(start)" type surfaces as a from_state/to_state
    // the virtual construction could never produce.
    require(!t.exists(_._1 == ConvState) && !t.exists(_._2 == StartState) &&
      !t.exists(_._2 == "(base)"),
      s"event types may not use the reserved names " +
        s"'$StartState'/'$ConvState'/'(base)'")
    val states = t.map(_._1).distinct
    val channels = t.map(_._2).distinct.filter(_ != ConvState).sorted
    // MarkovSteps-truncated conversion probability from START, with
    // transitions INTO `removed` dropped (their mass converts nothing)
    def pConv(removed: Option[String]): Double = {
      val kept = t.filter(tr => !removed.contains(tr._2))
      val byFrom = kept.groupBy(_._1)
      var v = states.map(_ -> 0.0).toMap
      for (_ <- 1 to MarkovSteps) {
        v = states.map { s =>
          val rows = byFrom.getOrElse(s, Array.empty)
          val cp = rows.find(_._2 == ConvState).map(_._3).getOrElse(0.0)
          val sp = rows.filter(_._2 != ConvState)
            .map(tr => dec6(tr._3 * v.getOrElse(tr._2, 0.0)))
            .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
            .doubleValue()
          s -> (cp + sp)
        }.toMap
      }
      v.getOrElse(StartState, 0.0)
    }
    val pBase = pConv(None)
    // no conversions reachable within the truncation → nothing to
    // attribute: an EMPTY result (the last_touch sibling's behavior),
    // never a NaN from 0/0 — the SQL twin's `WHERE p_base > 0` mirrors
    val empty = Seq.empty[(String, Double, Double, Double)]
    if (pBase == 0.0)
      return empty.toDF("channel", "p_base", "removal_effect", "attribution")
    val effects = channels.map { c =>
      c -> math.max(0.0, 1.0 - pConv(Some(c)) / pBase)
    }
    val total = effects
      .map { case (_, e) => dec6(e) }
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      .doubleValue()
    // every effect can round to zero (all below the decimal quantum,
    // or genuinely zero — conversions that need no touchpoints):
    // attribute 0 everywhere rather than divide 0/0 (the twin's CASE)
    effects.toSeq
      .map { case (c, e) =>
        (c, pBase, e, if (total == 0.0) 0.0 else e / total)
      }
      .toDF("channel", "p_base", "removal_effect", "attribution")
  }

  def a22MarkovAttribution(spark: SparkSession, dir: String): DataFrame =
    a22From(Tables(spark, dir, "events"))

  val a22Sql: String = {
    val stages = (1 to MarkovSteps).map { k =>
      val prev = s"v${k - 1}"
      s"""step$k AS MATERIALIZED (
         |  SELECT t.variant, t.from_state AS state,
         |    ${sqlDsum("t.p * v.vp")} AS sp
         |  FROM tvar t JOIN $prev v
         |    ON t.variant = v.variant AND t.to_state = v.state
         |  WHERE t.to_state <> '$ConvState'
         |  GROUP BY t.variant, t.from_state),
         |v$k AS MATERIALIZED (
         |  SELECT s.variant, s.state,
         |    coalesce(c.cp, 0.0) + coalesce(p.sp, 0.0) AS vp
         |  FROM states s
         |  LEFT JOIN convterm c ON s.variant = c.variant AND s.state = c.state
         |  LEFT JOIN step$k p ON s.variant = p.variant AND s.state = p.state)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH lagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    lag(event_type, 1) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
       |  FROM events),
       |tagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    sum(CASE WHEN prev_type = '$ConvType' THEN 1 ELSE 0 END) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS jid
       |  FROM lagged),
       |steps AS (
       |  SELECT coalesce(lag(event_type, 1) OVER
       |      (PARTITION BY user_id, jid ORDER BY ts, event_id),
       |      '$StartState') AS from_state,
       |    CASE WHEN event_type = '$ConvType' THEN '$ConvState'
       |      ELSE event_type END AS to_state
       |  FROM tagged),
       |trans AS (
       |  SELECT from_state, to_state, count(*) AS n
       |  FROM steps GROUP BY from_state, to_state),
       |probs AS MATERIALIZED (
       |  SELECT from_state, to_state,
       |    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_state) AS p
       |  FROM trans),
       |channels AS (
       |  SELECT DISTINCT to_state AS channel FROM probs
       |  WHERE to_state <> '$ConvState'),
       |variants AS (
       |  SELECT channel AS variant FROM channels
       |  UNION ALL SELECT '(base)'),
       |tvar AS MATERIALIZED (
       |  SELECT v.variant, p.from_state, p.to_state, p.p
       |  FROM probs p, variants v
       |  WHERE NOT (p.to_state = v.variant)),
       |convterm AS MATERIALIZED (
       |  SELECT variant, from_state AS state, p AS cp FROM tvar
       |  WHERE to_state = '$ConvState'),
       |states AS MATERIALIZED (
       |  SELECT v.variant, s.state
       |  FROM (SELECT DISTINCT from_state AS state FROM probs) s, variants v),
       |v0 AS (SELECT variant, state, CAST(0.0 AS DOUBLE) AS vp FROM states),
       |$stages,
       |atstart AS (
       |  SELECT variant, vp FROM v$MarkovSteps WHERE state = '$StartState'),
       |base AS (SELECT vp AS p_base FROM atstart WHERE variant = '(base)'),
       |effects AS (
       |  SELECT a.variant AS channel, b.p_base,
       |    greatest(CAST(0.0 AS DOUBLE), 1.0 - a.vp / b.p_base)
       |      AS removal_effect
       |  FROM atstart a, base b
       |  WHERE a.variant <> '(base)' AND b.p_base > 0)
       |SELECT channel, p_base, removal_effect,
       |  CASE WHEN CAST(sum(CAST(removal_effect AS DECIMAL(38,6)))
       |      OVER () AS DOUBLE) = 0 THEN CAST(0.0 AS DOUBLE)
       |    ELSE removal_effect /
       |      CAST(sum(CAST(removal_effect AS DECIMAL(38,6)))
       |        OVER () AS DOUBLE) END AS attribution
       |FROM effects""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "a14_event_paths" -> QueryDef.of(a14Sql)(a14EventPaths),
    "a15_attribution" -> QueryDef.of(a15Sql)(a15Attribution),
    "a16_ab_test" -> QueryDef.of(a16Sql)(a16AbTest),
    "a22_markov_attribution" -> QueryDef.of(a22Sql)(a22MarkovAttribution),
    "a3_ingest_metrics" -> QueryDef.of(a3Sql)(a3IngestMetrics)
  )
}
