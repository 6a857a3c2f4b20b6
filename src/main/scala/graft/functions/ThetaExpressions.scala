package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta-sketch aggregates and set-operation estimators
  * (org.apache.datasketches.theta, already on Spark's classpath — the
  * same library behind Spark's own `hll_sketch_agg`).
  *
  * Why theta next to HLL: HLL union is lossless and tiny, but HLL
  * cannot INTERSECT — "distinct users active in range A AND range B"
  * (retention, audience overlap) has no HLL answer. A theta sketch
  * retains the k smallest value hashes, so intersection/difference are
  * set operations on retained samples with well-studied error. The
  * rollup artifact (graft.ops.Sketches) carries both columns: HLL for
  * cheapest range-distinct, theta for range set-ops, each a few KB per
  * (day, group).
  *
  * Determinism: below k distinct values the sketch is in exact mode
  * and its retained set is a pure function of the input VALUE SET. In
  * ESTIMATION mode the guarantee is weaker: theta is set by quickselect
  * at table-rebuild time, which depends on insertion order, so
  * per-partition partials — and hence merged estimates — can differ
  * across partition layouts WITHIN the error bound. The verdict gates
  * therefore hash exact answers plus a within-bound flag and never an
  * estimate (an estimate hash would be layout-flaky); that discipline
  * is load-bearing, not belt-and-suspenders.
  * Both aggregates are TypedImperativeAggregate (object buffers under
  * ObjectHashAggregate), exactly how Spark hosts its own datasketches
  * aggregates; the scalar estimators run on post-aggregate relations
  * (rows ∝ groups, not corpus), so CodegenFallback costs nothing.
  */
private[graft] trait ThetaHelpers {
  protected def wrapCompact(bytes: Array[Byte]): CompactSketch =
    CompactSketch.wrap(Memory.wrap(bytes))
  protected def newUnion(lgK: Int): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()
}

/** Aggregates a LONG column into a compact theta sketch (binary). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with ThetaHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = newUnion(lgK)
  override def update(u: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) u.update(v.asInstanceOf[Long])
    u
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(u: Union): Any = u.getResult.toByteArray
  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion(lgK)
    u.union(wrapCompact(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_sketch_agg"
}

/** Merges a column of compact theta sketches (binary) into one. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with ThetaHelpers {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = newUnion(lgK)
  override def update(u: Union, row: InternalRow): Union = {
    val v = child.eval(row)
    if (v != null) u.union(wrapCompact(v.asInstanceOf[Array[Byte]]))
    u
  }
  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(u: Union): Any = u.getResult.toByteArray
  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion(lgK)
    u.union(wrapCompact(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_union_agg"
}

/** Rounded distinct estimate of a compact theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback with ThetaHelpers {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    math.round(wrapCompact(input.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

/** Rounded estimate of |A ∩ B| from two compact theta sketches — the
  * operation HLL cannot express. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ThetaHelpers {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrapCompact(a.asInstanceOf[Array[Byte]]))
    i.intersect(wrapCompact(b.asInstanceOf[Array[Byte]]))
    math.round(i.getResult.getEstimate)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_intersect_estimate"
}

/** Rounded estimate of |A \ B| from two compact theta sketches — the
  * difference completing the theta set algebra (churn: in A, gone
  * from B). */
case class ThetaDifferenceEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ThetaHelpers {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    math.round(op.aNotB(
      wrapCompact(a.asInstanceOf[Array[Byte]]),
      wrapCompact(b.asInstanceOf[Array[Byte]])).getEstimate)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_difference_estimate"
}

object ThetaFunctions {
  def thetaSketchAgg(c: Column, lgK: Int = 14): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(c), lgK).toAggregateExpression())
  def thetaUnionAgg(c: Column, lgK: Int = 14): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expression(c), lgK).toAggregateExpression())
  def thetaEstimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(c)))
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))
  def thetaDifferenceEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaDifferenceEstimate(Bridge.expression(a), Bridge.expression(b)))
}
