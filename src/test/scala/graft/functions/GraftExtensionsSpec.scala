package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension registers the custom expressions in the SQL function
  * registry — exercised through `spark.sql`, the surface a SQL-only user
  * would hit. Uses its own session: extensions bind at session build. */
class GraftExtensionsSpec extends AnyFunSuite {

  // Extensions bind only at session CREATION: getOrCreate would silently
  // return the suite-shared session (without extensions) when this runs
  // in the same JVM as other suites. Clear the active/default session,
  // build a fresh one (reusing the SparkContext), then restore.
  private lazy val spark: SparkSession = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prior.foreach(SparkSession.setDefaultSession)
    s
  }

  test("custom expressions callable from SQL") {
    val row = spark.sql(
      """SELECT go_long('007') AS l, go_long('9223372036854775808') AS overflow,
        |       go_double('1_000.5') AS d, go_double('0x1p3') AS hex,
        |       go_bool('TRUE') AS b, go_bool('yes') AS nb,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) == 7L)
    assert(row.isNullAt(1))       // int64 overflow → null, even under ANSI
    assert(row.getDouble(2) == 1000.5)
    assert(row.getDouble(3) == 8.0)
    assert(row.getBoolean(4))
    assert(row.isNullAt(5))
    assert(row.getDouble(6) == 11.0)
  }

  test("approximate sketches: HLL distinct within documented error of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.selectExpr(
      "approx_count_distinct(l_partkey) AS approx",
      "count(DISTINCT l_partkey) AS exact").collect()(0)
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    // default rsd = 5%; allow 3x slack for a small input
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }
}
