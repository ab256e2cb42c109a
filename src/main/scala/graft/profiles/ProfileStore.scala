package graft.profiles

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** User-profile mutation operators (SURVEY.md §2.5, U1-U8) — the
  * reference's one mutable table (`_users`,
  * PostgresqlUserStorage.java:146-808) restated as an append-only
  * operation log plus a merge view. The op-log is schema-free
  * (properties as a string map; values JSON-encoded) and typed at merge
  * time, which is how dynamic profile columns (U7) avoid DDL.
  *
  * Merge semantics (exactly the reference's SQL):
  *  - create/set  (U1/U2): last-write-wins
  *  - set_once    (U3): first non-null wins (`coalesce(col, ?)`)
  *  - increment   (U4): numeric sum on top of the last set base
  *  - unset       (U5): null; later sets may overwrite
  *  - batch       (U6): just rows in the log
  *  - property "id" renamed "_id" (U8)
  *
  * Ops are folded in (ts, seq) order per user. Two execution paths:
  *  - [[ProfileMerge.aggregator]] — a typed Aggregator whose buffer is
  *    an order-insensitive op list merged and sorted at finish; simple
  *    and exact, buffer ∝ ops-per-user.
  *  - [[ProfileMerge.mergeSorted]] — repartition by user + sort within
  *    partitions + streaming fold: O(1) memory per user, the 100 TB
  *    path. Both are property-tested equal to the naive sequential fold.
  */
final case class ProfileOp(
    project: String, id: String, ts: Long, seq: Long,
    kind: String, props: Map[String, String])

object ProfileOps {
  val Create = "create"
  val Set = "set"
  val SetOnce = "set_once"
  val Increment = "increment"
  val Unset = "unset"

  /** U8: `id` is the reserved PK name (PostgresqlUserStorage.java:131-144). */
  def normalizeProps(props: Map[String, String]): Map[String, String] =
    props.map { case (k, v) => (if (k == "id") "_id" else k) -> v }
}

object ProfileMerge {

  /** Reference-exact sequential fold of one user's ops (the naive
    * executor used as the property-test oracle and the per-user kernel
    * of both distributed paths). */
  def fold(ops: Seq[ProfileOp]): Map[String, String] = {
    val sorted = ops.sortBy(o => (o.ts, o.seq))
    val state = scala.collection.mutable.LinkedHashMap.empty[String, String]
    sorted.foreach { op =>
      val props = ProfileOps.normalizeProps(op.props)
      op.kind match {
        case ProfileOps.Create | ProfileOps.Set =>
          props.foreach { case (k, v) => state(k) = v }
        case ProfileOps.SetOnce =>
          props.foreach { case (k, v) =>
            if (state.get(k).orNull == null) state(k) = v }
        case ProfileOps.Increment =>
          props.foreach { case (k, v) =>
            val cur = state.get(k).flatMap(s => scala.util.Try(s.toDouble).toOption)
              .getOrElse(0.0) // coalesce(col, 0) (PostgresqlUserStorage.java:761-762)
            val delta = scala.util.Try(v.toDouble).getOrElse(0.0)
            state(k) = fmt(cur + delta)
          }
        case ProfileOps.Unset =>
          props.keys.foreach(k => state(k) = null)
        case other => throw new IllegalArgumentException(s"unknown op kind $other")
      }
    }
    state.toMap
  }

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  implicit private val opEncoder: Encoder[ProfileOp] = Encoders.product[ProfileOp]
  implicit private val bufEncoder: Encoder[List[ProfileOp]] =
    Encoders.kryo[List[ProfileOp]]
  implicit private val outEncoder: Encoder[Map[String, String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()

  /** Typed merge UDAF: buffer accumulates ops (commutative merge),
    * finish sorts and folds — exact regardless of partial-aggregation
    * order. */
  val aggregator: Aggregator[ProfileOp, List[ProfileOp], Map[String, String]] =
    new Aggregator[ProfileOp, List[ProfileOp], Map[String, String]] {
      def zero: List[ProfileOp] = Nil
      def reduce(b: List[ProfileOp], a: ProfileOp): List[ProfileOp] = a :: b
      def merge(x: List[ProfileOp], y: List[ProfileOp]): List[ProfileOp] = x ::: y
      def finish(b: List[ProfileOp]): Map[String, String] = fold(b)
      def bufferEncoder: Encoder[List[ProfileOp]] = bufEncoder
      def outputEncoder: Encoder[Map[String, String]] = outEncoder
    }

  /** Aggregator path: profiles as (project, id, properties-map). */
  def merge(ops: Dataset[ProfileOp]): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.groupByKey(o => (o.project, o.id))
      .agg(aggregator.toColumn.name("properties"))
      .map { case ((p, id), props) => (p, id, props) }
      .toDF("project", "id", "properties")
  }

  /** Point-in-time reconstruction: the profiles as they stood at
    * `(asOfTs, asOfSeq)` inclusive — the op-log's time-travel payoff
    * (a snapshot store can only serve "now"; the log replays any
    * moment: debugging "what did the segmentation see last Tuesday",
    * GDPR evidence, backtests). Same merge kernel over the filtered
    * prefix; cost scales with ops up to the cut, not with history
    * after it. */
  def snapshotAsOf(ops: Dataset[ProfileOp], asOfTs: Long,
      asOfSeq: Long = Long.MaxValue): DataFrame = {
    import ops.sparkSession.implicits._
    merge(ops.filter(o =>
      o.ts < asOfTs || (o.ts == asOfTs && o.seq <= asOfSeq)))
  }

  /** Scale path: one shuffle partitioned by (project, id), sorted by
    * (ts, seq) within partitions, then a constant-memory streaming fold
    * per user via iterator grouping — no per-user buffering. */
  def mergeSorted(ops: Dataset[ProfileOp]): DataFrame = {
    val spark = ops.sparkSession
    import spark.implicits._
    ops.repartition(col("project"), col("id"))
      .sortWithinPartitions(col("project"), col("id"), col("ts"), col("seq"))
      .mapPartitions { (it: Iterator[ProfileOp]) =>
        new Iterator[(String, String, Map[String, String])] {
          private val in = it.buffered
          def hasNext: Boolean = in.hasNext
          def next(): (String, String, Map[String, String]) = {
            val head = in.head
            val key = (head.project, head.id)
            val state = scala.collection.mutable.LinkedHashMap.empty[String, String]
            // ops arrive (ts, seq)-sorted: apply directly, O(1) memory
            while (in.hasNext &&
                (in.head.project, in.head.id) == key) {
              applyOp(state, in.next())
            }
            (key._1, key._2, state.toMap)
          }
        }
      }
      .toDF("project", "id", "properties")
  }

  private def applyOp(state: scala.collection.mutable.LinkedHashMap[String, String],
      op: ProfileOp): Unit = {
    val props = ProfileOps.normalizeProps(op.props)
    op.kind match {
      case ProfileOps.Create | ProfileOps.Set =>
        props.foreach { case (k, v) => state(k) = v }
      case ProfileOps.SetOnce =>
        props.foreach { case (k, v) => if (state.get(k).orNull == null) state(k) = v }
      case ProfileOps.Increment =>
        props.foreach { case (k, v) =>
          val cur = state.get(k).flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.0)
          state(k) = fmt(cur + scala.util.Try(v.toDouble).getOrElse(0.0))
        }
      case ProfileOps.Unset => props.keys.foreach(k => state(k) = null)
      case other => throw new IllegalArgumentException(s"unknown op kind $other")
    }
  }

  /** J3: point lookup against a merged profile table. */
  def getUser(profiles: DataFrame, project: String, id: String): DataFrame =
    profiles.filter(col("project") === project && col("id") === id)

  /** Op-log compaction: every op at or before `watermark` folds into an
    * equivalent per-user SNAPSHOT — a `set` of the live values plus an
    * `unset` tombstone for nulled keys, both stamped at the watermark —
    * unioned with the untouched tail. The tombstone matters: a later
    * `set_once` must still see an unset key as settable, exactly as it
    * would against the full log. Invariant (property-tested):
    * merge(compact(log, w)) == merge(log) for every split point. At
    * 100 TB this is the profile store's lifecycle: the log stays
    * bounded by ops-since-last-compaction, not account age. */
  def compactLog(ops: Dataset[ProfileOp], watermark: Long): Dataset[ProfileOp] = {
    import ops.sparkSession.implicits._
    val snapshot = ops.filter(_.ts <= watermark)
      .groupByKey(o => (o.project, o.id))
      .flatMapGroups { (key: (String, String), it: Iterator[ProfileOp]) =>
        val (project, id) = key
        val state = fold(it.toSeq)
        val live = state.filter(_._2 != null)
        val dead = state.collect { case (k, null) => k -> "" }
        val setOp =
          if (live.nonEmpty)
            Seq(ProfileOp(project, id, watermark, 0L, ProfileOps.Set, live))
          else Nil
        val unsetOp =
          if (dead.nonEmpty)
            Seq(ProfileOp(project, id, watermark, 1L, ProfileOps.Unset, dead))
          else Nil
        setOp ++ unsetOp
      }
    snapshot.union(ops.filter(_.ts > watermark))
  }
}
