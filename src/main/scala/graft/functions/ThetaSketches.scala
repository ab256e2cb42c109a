package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Theta sketches (Datasketches) as native aggregates — mergeable
  * distinct-SET state supporting set ALGEBRA: where HLL answers "how
  * many distinct", theta answers "how many distinct in A ∩ B" from
  * per-segment state alone. That is the one segmentation question
  * (audience overlap: users who did A and B) that is NOT mergeable
  * from counts — the exact form (w6's bool_or fold) must rescan events
  * for every new segment pair, while theta sketches intersect in
  * |sketch| time from per-segment state that refreshes like any other
  * MV column.
  *
  * Operators compose like the Datasketches SQL integrations (Druid/
  * Hive): `theta_sketch_agg` folds raw longs per group →
  * `theta_intersect`/`theta_union_pair` combine two serialized
  * sketches → `theta_estimate`/`theta_lb`/`theta_ub` read the result.
  * Below ~4k distinct items a theta sketch is in EXACT mode (θ = 1 —
  * the estimate IS the count), which is what makes the whole pipeline
  * oracle-checkable bit-for-bit at test scale while degrading to
  * bounded estimates at 100 TB.
  *
  * Ref: rakam's segmentation dashboards (funnel/retention overlap);
  * the reference delegates these to exact SQL — which is the w6 twin
  * here — and has no mergeable-state path.
  */
final case class ThetaSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg requires a bigint column, got $other")
    }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "theta_sketch_agg"
}

/** Union-merge of serialized sketches across rows (MV state merge). */
final case class ThetaUnionAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      buf.union(Sketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult())
    buf
  }

  override def eval(buf: Union): Any = buf.getResult().toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult().toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_union_agg requires serialized sketches (binary), got $other")
    }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
  override def prettyName: String = "theta_union_agg"
}

private[functions] object ThetaOps {
  def read(bytes: Any): Sketch =
    Sketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
}

/** A ∩ B of two serialized sketches → serialized compact sketch. */
final case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect requires two serialized sketches, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaOps.read(a))
    i.intersect(ThetaOps.read(b))
    i.getResult().toByteArray
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersect = copy(left = l, right = r)
  override def prettyName: String = "theta_intersect"
}

/** Distinct estimate of a serialized sketch. Exact below ~4k items. */
final case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_estimate requires a serialized sketch, got $other")
    }
  override def nullSafeEval(a: Any): Any = ThetaOps.read(a).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

/** Lower/upper bound of the true distinct count at `sd` standard
  * deviations (1, 2, or 3). */
final case class ThetaBound(child: Expression, sd: Int, upper: Boolean)
  extends UnaryExpression with CodegenFallback {
  require(sd >= 1 && sd <= 3, "sd must be 1, 2, or 3")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta bound requires a serialized sketch, got $other")
    }
  override def nullSafeEval(a: Any): Any = {
    val s = ThetaOps.read(a)
    if (upper) s.getUpperBound(sd) else s.getLowerBound(sd)
  }
  override protected def withNewChildInternal(c: Expression): ThetaBound =
    copy(child = c)
  override def prettyName: String = if (upper) "theta_ub" else "theta_lb"
}

/** Column-level API. */
object ThetaSketches {
  def thetaSketchAgg(c: Column): Column =
    column(ThetaSketchAgg(expression(c)).toAggregateExpression())
  def thetaUnionAgg(c: Column): Column =
    column(ThetaUnionAgg(expression(c)).toAggregateExpression())
  def thetaIntersect(a: Column, b: Column): Column =
    column(ThetaIntersect(expression(a), expression(b)))
  def thetaEstimate(c: Column): Column =
    column(ThetaEstimate(expression(c)))
  def thetaLb(c: Column, sd: Int = 2): Column =
    column(ThetaBound(expression(c), sd, upper = false))
  def thetaUb(c: Column, sd: Int = 2): Column =
    column(ThetaBound(expression(c), sd, upper = true))
}
