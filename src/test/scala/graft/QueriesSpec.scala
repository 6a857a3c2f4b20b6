package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape spec for the SparkEntry query surface. Value-level
  * correctness is enforced by the DuckDB parity gate
  * (tools/check_parity.py replicating the driver); here we pin the
  * contract: every query runs, returns rows at sf0.001, has an oracle
  * with identical column names, and is deterministic across two runs.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries deliberately without a DuckDB oracle (driver falls back to
    * its rows-only check); each needs a value-level assertion below. */
  private val rowsOnly = Set("q50_approx_distinct", "q55_approx_percentiles")

  test("every query has an oracle (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("q50 HLL sketch stays within 2% of the exact distinct count") {
    val rows = SparkEntry.queries("q50_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val err = r.getAs[Double]("rel_err")
      assert(err <= 0.02, s"rel_err $err for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("q55 quantile sketch tracks the exact percentile per group") {
    val rows = SparkEntry.queries("q55_approx_percentiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows; q <- Seq("p50", "p95")) {
      val approx = r.getAs[Double](s"${q}_approx")
      val exact = r.getAs[Double](s"${q}_exact")
      val tol = math.max(math.abs(exact) * 0.05, 0.5)
      assert(math.abs(approx - exact) <= tol,
        s"$q approx=$approx exact=$exact for ${r.getAs[String]("event_type")}")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs, is non-empty, and repeats deterministically") {
      val df1 = fn(spark, dir)
      val rows1 = df1.collect()
      assert(rows1.nonEmpty, s"$name returned no rows at sf0.001")
      val rows2 = fn(spark, dir).collect()
      assert(rows1.sameElements(rows2), s"$name is not deterministic")
    }
  }
}
