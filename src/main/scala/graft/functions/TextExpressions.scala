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

/** `size(regexp_extract_all(c, "\\b(w1|w2|…)\\b", 0))` for a fixed
  * lowercase word list — whole-`\b`-word hit counting as one byte pass
  * (contract: TextNorm.countWordsUtf8). The compiled word-byte table is
  * embedded in the generated class via `addReferenceObj`. */
case class CountWords(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.countWordsUtf8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], wordBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftWords", wordBytes, "byte[][]")
      s"${ev.value} = graft.core.TextNorm.countWordsUtf8($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "count_words"
}

/** `length(regexp_replace(c, "[a-zA-Z0-9\\s]", ""))` — code points
  * outside ASCII alnum/whitespace (punctuation-ratio numerator). */
case class CountNonAlnumChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.countNonAlnumCharsUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.countNonAlnumCharsUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "count_non_alnum_chars"
}

/** `length(regexp_replace(c, "\\s", ""))` — non-ASCII-whitespace code
  * points (avg-token-length numerator). */
case class CountNonWsChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.countNonWsCharsUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextNorm.countNonWsCharsUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "count_non_ws_chars"
}

/** Winnowed k-gram fingerprints (kernel and cross-engine arithmetic
  * contract: [[graft.core.Winnow]]) — O(n) rolling-hash + sliding-min
  * per row, replacing the md5/slice HOF chain that measured 241 s at the
  * 100× corpus. Stays inside WholeStageCodegen via a static call. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    graft.core.Winnow.fingerprintsUtf8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Winnow.fingerprintsUtf8($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object TextFunctions {
  def normalizeText(c: Column): Column = Bridge.column(NormalizeText(Bridge.expression(c)))
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))
  def splitWhitespace(c: Column): Column = Bridge.column(SplitWhitespace(Bridge.expression(c)))
  def countTokens(c: Column): Column = Bridge.column(CountTokens(Bridge.expression(c)))
  def countBpeTokens(c: Column): Column = Bridge.column(CountBpeTokens(Bridge.expression(c)))
  def countWords(c: Column, words: Seq[String]): Column =
    Bridge.column(CountWords(Bridge.expression(c), words))
  def countNonAlnumChars(c: Column): Column = Bridge.column(CountNonAlnumChars(Bridge.expression(c)))
  def countNonWsChars(c: Column): Column = Bridge.column(CountNonWsChars(Bridge.expression(c)))
}
