package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a string column.
  *
  * Why an expression and not a UDF: the probe sits on the hottest path a
  * decontamination scan has (every training gram goes through it), and a
  * Scala UDF would both break whole-stage codegen and pay a
  * UTF8String→String conversion per row. This stays inside the generated
  * loop via a reference object, probing the filter's raw-bytes API
  * directly.
  *
  * Why Bloom at all: the exact broadcast-join decontamination (q69)
  * ships the full distinct eval-gram SET to every executor. At real
  * benchmark-suite sizes (tens of millions of grams × tens of bytes)
  * that broadcast is gigabytes; the equivalent Bloom filter at 1% FPP is
  * ~1.2 bytes per gram — 30-50× smaller — at the cost of false
  * positives, which a downstream exact confirm join removes. The filter
  * never produces false NEGATIVES, so prefilter + exact confirm is
  * value-identical to the exact join (pinned by BloomDecontaminateSpec).
  *
  * The filter object is carried as a serialized plan constant
  * (`BloomFilterImpl implements Serializable`) and surfaces in codegen
  * via `addReferenceObj` — per-partition it deserializes once, not per
  * row. Probes hash the UTF-8 bytes (`mightContainBinary`), matching
  * `putString`'s encoding on the build side. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  def mightContain(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloom))
}
