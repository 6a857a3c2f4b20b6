package graft.functions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Frequency-sketch (heavy hitters) aggregates over a LONG item column
  * (org.apache.datasketches.frequencies.LongsSketch — the mergeable
  * Misra-Gries-family sketch, already on Spark's classpath).
  *
  * Why a THIRD sketch family in the daily rollup: HLL answers "how
  * many distinct", theta answers "distinct with set algebra", but
  * neither answers "WHICH items dominate" — per-day persisted
  * frequency sketches do, for arbitrary date ranges, without
  * rescanning raw events (the 100 TB shape of q150's one-shot MG
  * pass). Merge is associative with additive error bounds, so serving
  * cost ∝ days × groups.
  *
  * Determinism discipline (the q150/theta rule): a LongsSketch's
  * retained counters depend on stream order once purges begin, so
  * estimates are layout-stable only within the error bound — the
  * verdict gates hash EXACT answers plus a bound flag built on the
  * sketch's own lower/upper-bound THEOREM (lb(x) ≤ c(x) ≤ ub(x) for
  * every x, any merge order), and never an estimate. Below maxMapSize
  * distinct items the sketch never purges and is exact. */
private[graft] trait FreqHelpers {
  protected def wrapFreq(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))
}

/** Aggregates a LONG column into a serialized LongsSketch (binary).
  * `maxMapSize` must be a power of 2; error ≤ 3.5·n/maxMapSize. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with FreqHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)
  override def update(sk: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) sk.update(v.asInstanceOf[Long])
    sk
  }
  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = a.merge(b)
  override def eval(sk: LongsSketch): Any = sk.toByteArray
  override def serialize(sk: LongsSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch = wrapFreq(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_sketch_agg"
}

/** Merges a column of serialized LongsSketches into one (error bounds
  * add across merges — the sketch tracks its own maximum error). */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with FreqHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)
  override def update(sk: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) sk.merge(wrapFreq(v.asInstanceOf[Array[Byte]])) else sk
  }
  override def merge(a: LongsSketch, b: LongsSketch): LongsSketch = a.merge(b)
  override def eval(sk: LongsSketch): Any = sk.toByteArray
  override def serialize(sk: LongsSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch = wrapFreq(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_union_agg"
}

/** The sketch's guaranteed lower bound on an item's true count —
  * lb(x) ≤ c(x) for every x and any merge order (the capture theorem's
  * left half). Runs on post-aggregate relations only (rows ∝ groups),
  * so CodegenFallback costs nothing. */
case class FreqLowerBound(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with FreqHelpers {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, item: Any): Any =
    wrapFreq(sk.asInstanceOf[Array[Byte]]).getLowerBound(item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_lower_bound"
}

/** The sketch's guaranteed upper bound on an item's true count —
  * c(x) ≤ ub(x) (the theorem's right half; for an untracked item this
  * is the sketch's maximum error). */
case class FreqUpperBound(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with FreqHelpers {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, item: Any): Any =
    wrapFreq(sk.asInstanceOf[Array[Byte]]).getUpperBound(item.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "freq_upper_bound"
}

object FreqFunctions {
  def freqSketchAgg(c: Column, maxMapSize: Int = 256): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(c), maxMapSize).toAggregateExpression())
  def freqUnionAgg(c: Column, maxMapSize: Int = 256): Column =
    Bridge.column(FreqUnionAgg(Bridge.expression(c), maxMapSize).toAggregateExpression())
  def freqLowerBound(sk: Column, item: Column): Column =
    Bridge.column(FreqLowerBound(Bridge.expression(sk), Bridge.expression(item)))
  def freqUpperBound(sk: Column, item: Column): Column =
    Bridge.column(FreqUpperBound(Bridge.expression(sk), Bridge.expression(item)))
}
