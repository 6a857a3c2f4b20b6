package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

import graft.core.TextNorm

/** Codegen'd single-pass replacements for the two regex chains every
  * text/dedup operator pays before doing its real work (kernels and
  * equivalence contracts: [[graft.core.TextNorm]]). Both stay inside
  * WholeStageCodegen via a static call, same shape as [[GoTrim]]. */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.normalizeUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.normalizeUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "normalize_text"
}

/** `regexp_extract_all(c, "\\S+", 0)` as one byte pass; exact for all
  * input (Java `\s` is ASCII-only — see TextNorm). */
case class SplitWhitespace(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.splitWhitespaceUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.splitWhitespaceUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "split_whitespace"
}

/** `size(regexp_extract_all(c, "\\S+", 0))` as a count-only byte pass —
  * no token array is materialized. LongType (the stats queries cast
  * counts to long for the BIGINT-surfacing oracle anyway). */
case class CountTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.countTokensUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.countTokensUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "count_tokens"
}

/** `size(regexp_extract_all(c, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))`
  * — the BPE-ish pre-token count, one byte pass, code-point-exact. */
case class CountBpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.countBpeTokensUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.countBpeTokensUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "count_bpe_tokens"
}

object TextFunctions {
  def normalizeText(c: Column): Column = Bridge.column(NormalizeText(Bridge.expression(c)))
  def splitWhitespace(c: Column): Column = Bridge.column(SplitWhitespace(Bridge.expression(c)))
  def countTokens(c: Column): Column = Bridge.column(CountTokens(Bridge.expression(c)))
  def countBpeTokens(c: Column): Column = Bridge.column(CountBpeTokens(Bridge.expression(c)))
}
