package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The BandJoinRewrite planner rule: a pure-inequality inner join plans
  * as BroadcastNestedLoopJoin by default; with a bucket width configured
  * the rule turns it into a hash-joinable equi-join WITHOUT changing
  * results. */
class BandJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def points: DataFrame =
    spark.range(2000).select(col("id").as("pid"),
      ((col("id") * 7919) % 997).cast("double").as("v"))

  private def bands: DataFrame =
    spark.range(40).select(col("id").as("band_id"),
      (col("id") * 25 - 50).cast("double").as("lo"),
      (col("id") * 25 + 10).cast("double").as("hi"))

  private def joined: DataFrame =
    points.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "band_id")

  private def withWidth[A](w: String)(f: => A): A = {
    spark.conf.set(BandJoinRewrite.WidthKey, w)
    try f finally spark.conf.unset(BandJoinRewrite.WidthKey)
  }

  test("without the width conf the band join is a nested-loop product") {
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("with a width the rule plans an equi-join and keeps results identical") {
    val expected = joined.orderBy("pid", "band_id").collect()
    val (plan, got) = withWidth("25") {
      val df = joined
      (df.queryExecution.executedPlan.toString, df.orderBy("pid", "band_id").collect())
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("Join"), plan.take(2000))
    assert(expected.nonEmpty && got.sameElements(expected),
      s"rewrite changed results: ${got.length} vs ${expected.length} rows")
  }

  test("joins that already have an equi key are left alone") {
    val equi = points.join(bands, col("pid") === col("band_id") && col("v") >= col("lo"))
    val expected = equi.select("pid").orderBy("pid").collect()
    val got = withWidth("25") { equi.select("pid").orderBy("pid").collect() }
    assert(got.sameElements(expected))
  }

  test("bogus width values disable the rule instead of crashing") {
    for (w <- Seq("0", "-3", "NaN", "banana")) {
      val got = withWidth(w) { joined.count() }
      assert(got == joined.count())
    }
  }

  test("extra conjuncts ride along in the residual condition") {
    val extra = points.join(bands,
      col("v") >= col("lo") && col("v") < col("hi") && col("band_id") % 2 === 0)
      .select("pid", "band_id")
    val expected = extra.orderBy("pid", "band_id").collect()
    val (plan, got) = withWidth("25") {
      (extra.queryExecution.executedPlan.toString, extra.orderBy("pid", "band_id").collect())
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(expected.nonEmpty && got.sameElements(expected))
  }

  test("rewrite leaves non-inner band joins untouched") {
    val leftJoin = points.join(bands,
      col("v") >= col("lo") && col("v") < col("hi"), "left")
      .select("pid", "band_id")
    val expected = leftJoin.orderBy("pid", "band_id").collect()
    val got = withWidth("25") { leftJoin.orderBy("pid", "band_id").collect() }
    assert(got.sameElements(expected))
  }
}
