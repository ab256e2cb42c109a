package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a big-×-big point-in-interval join into the
  * binned equi join (the oracle-proven j9 shape,
  * [[graft.analytics.JoinQueries2.pointInIntervalJoin]]).
  *
  * Spark has no native interval-join operator: an inner join whose only
  * condition is `p BETWEEN s AND e` carries no equi keys, so the planner
  * falls back to BroadcastNestedLoopJoin — or, when neither side fits the
  * broadcast threshold, a CartesianProduct that compares every point with
  * every interval. At 100 TB that is the difference between a query and an
  * outage. The reference meets the same shape in its retention/funnel SQL
  * (rakam/src/main/java/org/rakam/analysis/RetentionQueryExecutor.java
  * builds epoch-window BETWEEN predicates); on Spark the scalable form is:
  *
  *   - explode each interval to the fixed-width time bins it covers,
  *   - tag each point with its single bin,
  *   - equi-join on the bin and keep the exact BETWEEN as a residual.
  *
  * Each qualifying (point, interval) pair meets in exactly one bin — the
  * point's — so the rewrite needs no dedup pass and is row-for-row
  * equivalent to the nested loop (the residual keeps exactness; bins only
  * bound the candidate space). Fan-out is interval-length / bin-width and
  * the shuffle key is also the time-locality key.
  *
  * The rule fires only when the nested loop is the real alternative:
  *   - inner join, no join hint, and no usable equi conjunct;
  *   - a conjunct pair lower/upper-bounding one side's timestamp column
  *     by timestamps from the other side;
  *   - BOTH sides above `spark.sql.autoBroadcastJoinThreshold` (a
  *     broadcastable small side already plans a cheap BNLJ — e.g. the j2
  *     dim-range lookup — and must keep it), unless
  *     `spark.graft.intervalJoin.force=true`.
  *
  * Confs: `spark.graft.intervalJoin.enabled` (default true),
  * `spark.graft.intervalJoin.unit` (minute|hour|day, default hour),
  * `spark.graft.intervalJoin.force` (default false, test/ops override of
  * the size guard). Injected by [[graft.GraftExtensions]].
  */
object BinnedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val Units: Map[String, Long] = Map(
    "minute" -> 60L * 1000000L,
    "hour" -> 3600L * 1000000L,
    "day" -> 86400L * 1000000L)

  private def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** Types the rule can bin: timestamps (trunc to the configured unit)
    * and dates (already day-grained — the date IS the bin). */
  private def isBinnable(dt: DataType): Boolean =
    isTimestamp(dt) || dt == DateType

  /** One reading of a comparison conjunct as "point is bounded": the
    * bounded (point) expression, the bounding expression from the other
    * side, whether the bound is a lower bound, and whether the point
    * lives on the join's left side. */
  private case class Bound(
      point: Expression, bound: Expression, isLower: Boolean,
      pointOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.intervalJoin.enabled", "true").toBoolean) {
      return plan
    }
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), hint) if hint == JoinHint.NONE =>
        rewrite(j).getOrElse(j)
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None

    // An equi conjunct between the sides means the planner already has a
    // hash/sort-merge key — the nested loop is not the alternative.
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => sideOf(a).isDefined && sideOf(b).isDefined &&
        sideOf(a) != sideOf(b)
      case EqualNullSafe(a, b) => sideOf(a).isDefined && sideOf(b).isDefined &&
        sideOf(a) != sideOf(b)
      case _ => false
    }
    if (hasEquiKey) return None

    val force =
      conf.getConfString("spark.graft.intervalJoin.force", "false").toBoolean
    val thr = conf.autoBroadcastJoinThreshold
    val bothBig = thr < 0 ||
      (j.left.stats.sizeInBytes > thr && j.right.stats.sizeInBytes > thr)
    if (!(force || bothBig)) return None

    // Read every timestamp comparison both ways: `a >= b` lower-bounds a
    // by b AND upper-bounds b by a.
    def readings(hi: Expression, lo: Expression): Seq[Bound] =
      (sideOf(hi), sideOf(lo)) match {
        case (Some(hs), Some(ls)) if hs != ls &&
            isBinnable(hi.dataType) && hi.dataType == lo.dataType =>
          Seq(Bound(hi, lo, isLower = true, pointOnLeft = hs),
            Bound(lo, hi, isLower = false, pointOnLeft = ls))
        case _ => Nil
      }
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => readings(a, b)
      case GreaterThan(a, b) => readings(a, b)
      case LessThanOrEqual(a, b) => readings(b, a)
      case LessThan(a, b) => readings(b, a)
      case _ => Nil
    }
    val pair = (for {
      lo <- bounds.iterator if lo.isLower
      hi <- bounds.iterator
      if !hi.isLower && hi.pointOnLeft == lo.pointOnLeft &&
        hi.point.semanticEquals(lo.point)
    } yield (lo, hi)).nextOption()

    pair.map { case (lo, hi) =>
      val isDate = lo.point.dataType == DateType
      val unitName =
        if (isDate) "day"
        else conf.getConfString("spark.graft.intervalJoin.unit", "hour")
      val stepMicros = Units.getOrElse(unitName,
        throw new IllegalArgumentException(
          s"spark.graft.intervalJoin.unit must be one of ${Units.keys.mkString(", ")}: $unitName"))
      val tz = Some(conf.sessionLocalTimeZone)
      // Bin key = epoch-micros DIV bin-width: a plain LONG computed
      // identically on both sides and independent of the session zone.
      // Truncating to local time units (date_trunc) would be WRONG in a
      // DST session zone: local midnights sit 23/25 h apart across a
      // transition, so a fixed-width sequence can skip the bin a point
      // truncates into and silently drop matching rows. NTZ inputs are
      // mapped onto the micros axis at a FIXED zone (UTC — no DST, so
      // the cast is strictly monotone); monotonicity is all bin coverage
      // needs, because the exact BETWEEN residual still compares the
      // original untouched values. A DATE is already day-grained and
      // zone-free: the value IS its bin.
      def binOf(e: Expression): Expression =
        if (isDate) e
        else {
          val asLtz =
            if (e.dataType == TimestampType) e
            else Cast(e, TimestampType, Some("UTC"))
          new IntegralDivide(UnixMicros(asLtz), Literal(stepMicros))
        }
      // sequence over DATEs needs a day-granular interval literal;
      // long bins just step by 1
      val step =
        if (isDate) Literal(stepMicros, DayTimeIntervalType(0, 0))
        else Literal(1L, LongType)

      val (pointPlan, intervalPlan) =
        if (lo.pointOnLeft) (j.left, j.right) else (j.right, j.left)
      val pAlias = Alias(binOf(lo.point), "__graft_pbin")()
      val pointProj = Project(pointPlan.output :+ pAlias, pointPlan)
      // Guard start<=end BEFORE the explode: sequence() throws on a
      // descending range with a positive step, while the original nested
      // loop just produced no match. (Null bounds pass through: the
      // filter drops them, exactly as the BETWEEN residual would have.)
      val ivFiltered = Filter(LessThanOrEqual(lo.bound, hi.bound), intervalPlan)
      val seq = new Sequence(
        binOf(lo.bound), binOf(hi.bound), Some(step), tz)
      val ibin = AttributeReference("__graft_ibin",
        if (isDate) DateType else LongType, nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibin),
        child = ivFiltered)
      // Equi key on the bin; the ORIGINAL condition rides along unchanged
      // as the exact residual (so strict bounds and extra conjuncts keep
      // their semantics bit-for-bit).
      val newCond = And(EqualTo(pAlias.toAttribute, ibin), j.condition.get)
      val joined = Join(pointProj, gen, Inner, Some(newCond), JoinHint.NONE)
      logInfo(s"graft: rewrote point-in-interval join to $unitName-binned " +
        s"equi join (point=${lo.point.sql})")
      Project(j.output, joined)
    }
  }
}
