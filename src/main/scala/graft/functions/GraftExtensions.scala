package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's custom Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT go_long(c), dot_product(a, b)")`
  * works anywhere the library is on the classpath:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // programmatic
  * // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * This is rung (b)→SQL of the custom-operator ladder: scalar semantics
  * as native expressions, surfaced through the function registry rather
  * than a planner rule (none of our operators need whole-plan nodes —
  * SURVEY.md §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def one(name: String, build: Expression => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GoCastExpression", name),
      (exprs: Seq[Expression]) => build(exprs.head))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(one("go_long", GoLong))
    ext.injectFunction(one("go_double", GoDouble))
    ext.injectFunction(one("go_bool", GoBool))
    ext.injectFunction((new FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft.functions.DotProduct", "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    // rung (c): a planner rule — rewrites pure-inequality band joins into
    // bucketed equi-joins when spark.graft.bandJoin.bucketWidth is set
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
