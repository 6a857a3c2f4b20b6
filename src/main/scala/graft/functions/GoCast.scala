package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

import graft.core.GoParse

/** Native Catalyst expressions implementing the reference's cell-cast
  * semantics (converter/converter.go:380-412): a cell that fails to parse
  * as the column's inferred type becomes NULL — never an error.
  *
  * These exist (instead of `col.cast(...)`) because:
  *  - Spark 4 defaults to ANSI mode, where `cast` *throws* on overflow /
  *    malformed input instead of the reference's silent-null;
  *  - JVM and Go parsers disagree on edge syntax (`inf`, `1_000.5`, hex
  *    floats, `"1d"`, whitespace) — `GoParse` pins the Go grammar;
  *  - a codegen'd Expression stays inside WholeStageCodegen, unlike a
  *    Scala UDF.
  *
  * All three are deterministic, null-intolerant scalar expressions over a
  * string child.
  */
abstract class GoCastExpression extends UnaryExpression {
  override def nullable: Boolean = true
  /** GoParse method taking the child's UTF8String and returning a boxed
    * parse result (null on failure) — the zero-copy byte-wise fast paths,
    * which fall back internally to the String grammar for exotic input. */
  protected def parserMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("goParsed")
      val box = boxedJavaType
      // explicit .xxxValue() unbox — Janino has no auto-unboxing
      s"""
         |$box $tmp = graft.core.GoParse.$parserMethod($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.$unboxMethod(); }
       """.stripMargin
    })

  protected def boxedJavaType: String
  protected def unboxMethod: String
}

case class GoLong(child: Expression) extends GoCastExpression {
  override def dataType: DataType = LongType
  override protected def parserMethod: String = "parseLongBoxedUtf8"
  override protected def boxedJavaType: String = "java.lang.Long"
  override protected def unboxMethod: String = "longValue"
  override protected def nullSafeEval(input: Any): Any =
    GoParse.parseLongBoxedUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "go_long"
}

case class GoDouble(child: Expression) extends GoCastExpression {
  override def dataType: DataType = DoubleType
  override protected def parserMethod: String = "parseDoubleBoxedUtf8"
  override protected def boxedJavaType: String = "java.lang.Double"
  override protected def unboxMethod: String = "doubleValue"
  override protected def nullSafeEval(input: Any): Any =
    GoParse.parseDoubleBoxedUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "go_double"
}

case class GoBool(child: Expression) extends GoCastExpression {
  override def dataType: DataType = BooleanType
  override protected def parserMethod: String = "parseBoolBoxedUtf8"
  override protected def boxedJavaType: String = "java.lang.Boolean"
  override protected def unboxMethod: String = "booleanValue"
  override protected def nullSafeEval(input: Any): Any =
    GoParse.parseBoolBoxedUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "go_bool"
}

/** Go `strings.TrimSpace` as a codegen'd expression. Exists because
  * Spark's `trim()` strips only ASCII 0x20 while the reference trims the
  * full Go whitespace set — using `trim()` would let inference (which
  * trims Go-style) classify a tab-padded cell as INT64 and then have the
  * cast stage reject the untrimmed value to NULL. */
case class GoTrim(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(input: Any): Any =
    GoParse.trimSpaceUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.GoParse.trimSpaceUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "go_trim"
}

object GoCast {
  def goLong(c: Column): Column = Bridge.column(GoLong(Bridge.expression(c)))
  def goDouble(c: Column): Column = Bridge.column(GoDouble(Bridge.expression(c)))
  def goBool(c: Column): Column = Bridge.column(GoBool(Bridge.expression(c)))
  def goTrim(c: Column): Column = Bridge.column(GoTrim(Bridge.expression(c)))
}
