package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile-sketch aggregates (org.apache.datasketches.kll) — the
  * third sketch column of the rollup artifact (graft.ops.Sketches).
  *
  * Why KLL next to `percentile_approx`: Spark's built-in quantile
  * aggregate answers a one-shot query but its sketch state is not a
  * persistable column — there is no "aggregate once per day, merge at
  * serve time" path, which is the whole economics of the rollup at
  * 100 TB. A KLL sketch is a mergeable binary with a DISTRIBUTION-FREE
  * normalized-rank guarantee (~1.65 % at k=200, two-sided 99 %), so
  * per-(day, group) sketches of a few KB serve p50/p99 over arbitrary
  * date ranges without touching raw events.
  *
  * KLL compaction draws random offsets, so two differently-partitioned
  * builds may retain different samples — estimates can wiggle within
  * the rank guarantee. The gates therefore never hash the estimate:
  * they hash exact answers plus a rank-error verdict flag whose
  * tolerance (5 %) sits 3× outside the sketch's 99 % band
  * (the same discipline as every verdict gate here).
  */
private[graft] trait KllHelpers {
  protected def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregates a DOUBLE column into a compact KLL sketch (binary). */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(sk: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) sk.update(v.asInstanceOf[Double])
    sk
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merges a column of compact KLL sketches (binary) into one. */
case class KllUnionAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with KllHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def update(sk: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) sk.merge(heapify(v.asInstanceOf[Array[Byte]]))
    sk
  }
  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }
  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = heapify(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_union_agg"
}

/** The sketch's quantile estimate at normalized rank `phi` — an actual
  * retained item (INCLUSIVE criteria), so the verdict's exact-rank
  * check is well-defined. An EMPTY sketch (a group whose value column
  * was entirely null over the range) yields null rather than the
  * SketchesArgumentException datasketches throws — the exact side of
  * the verdicts emits n_values = 0 for such a group, and a null
  * estimate propagates to a 0 flag instead of crashing the serve. */
case class KllQuantile(child: Expression, phi: Double)
    extends UnaryExpression with CodegenFallback with KllHelpers {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val sk = heapify(input.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(phi, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kll_quantile"
}

object KllFunctions {
  def kllSketchAgg(c: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(c), k).toAggregateExpression())
  def kllUnionAgg(c: Column, k: Int = 200): Column =
    Bridge.column(KllUnionAgg(Bridge.expression(c), k).toAggregateExpression())
  def kllQuantile(c: Column, phi: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(c), phi))
}
