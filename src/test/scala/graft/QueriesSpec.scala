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

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("q50 HLL sketch stays within 2% of the exact distinct count") {
    val rows = SparkEntry.queries("q50_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("within_bound") == 1L,
        s"HLL out of bound for ${r.getAs[String]("l_returnflag")}")
  }

  test("q55 quantile sketch tracks the exact percentile per group") {
    val rows = SparkEntry.queries("q55_approx_percentiles")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("within_bound") == 1L,
        s"quantile sketch out of bound for ${r.getAs[String]("event_type")}")
  }

  test("q140 IVFADC quantization recall clears its per-config floor") {
    val rows = SparkEntry.queries("q140_ann_ivfpq_recall")(spark, dir).collect()
    assert(rows.length == 3)
    for (r <- rows)
      assert(r.getAs[Long]("within_bound") == 1L,
        s"quant recall out of bound for ${r.getAs[String]("method")}: " +
          s"${r.getAs[Double]("quant_recall")}")
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
