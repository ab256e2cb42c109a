package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketches (Datasketches) as native Catalyst
  * aggregates — the percentile counterpart of the HLL distinct state
  * the engine already uses for materialized views: `approx_percentile`
  * produces a NUMBER, which cannot be refreshed from deltas, while a
  * KLL sketch is partial state — union-mergeable across batches,
  * partitions, and replays — with a PROVEN normalized-rank error bound
  * (~1.65% at k=200, 99% confidence; Karnin-Lang-Liberty, FOCS 2016).
  *
  * At 100 TB: per-group percentile state is a few KB regardless of row
  * count; a delta batch partial-aggregates map-side (each task folds
  * its rows into one sketch) and merges at |groups| cost — history is
  * never rescanned. The scalar reader [[KllQuantile]] runs at serving
  * time over |groups| rows, so its CodegenFallback is off the hot path
  * by construction.
  *
  * Ref: the reference serves pre-computed percentile reports
  * (rakam's continuous/materialized query surface); a mergeable sketch
  * is the only way that state refreshes incrementally.
  */
final case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg requires a double column, got $other")
    }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "kll_sketch_agg"
}

/** Union of serialized KLL sketches — the state-merge aggregate a
  * materialized view runs at refresh (inputs are |groups| binary
  * blobs, never raw rows). */
final case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg requires serialized sketches (binary), got $other")
    }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "kll_merge_agg"
}

/** Read one quantile out of a serialized sketch (INCLUSIVE search, the
  * Datasketches default). NULL for the empty sketch — a group that saw
  * only nulls has no quantiles, not a fabricated zero. Serving-time
  * only (|groups| rows), hence CodegenFallback. */
final case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary sketch, double rank), got $other")
    }

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(q.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
  override def prettyName: String = "kll_quantile"
}

/** Column-level API. */
object KllQuantiles {
  /** Fold a double column into one KLL sketch per group. */
  def kllSketchAgg(c: Column, k: Int = 200): Column =
    column(KllSketchAgg(expression(c), k).toAggregateExpression())

  /** Union serialized sketches (state merge). */
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    column(KllMergeAgg(expression(c), k).toAggregateExpression())

  /** Estimated quantile at normalized rank `q` ∈ [0,1]. */
  def kllQuantile(c: Column, q: Double): Column =
    column(KllQuantile(expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))

  /** The sketch's one-sided normalized rank error at 99% confidence. */
  def rankError(k: Int = 200): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
}
