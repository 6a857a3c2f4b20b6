package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q118 invariants: no source exceeds its epoch cap, capped sources sit
  * exactly at it, and the budget is conserved through redistribution
  * (up to whole-token rounding) whenever the second-round clip never
  * binds. */
class BudgetAllocationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("no allocation exceeds the epoch cap; capped sources sit at it") {
    val out = Sampling.budgetAllocation(spark, dir, alpha = 0.3,
      budgetFrac = 0.9, maxEpochs = 1.0).cache()
    assert(out.where(col("alloc_tokens") > col("n_tokens")).count() == 0,
      "allocation above the 1-epoch cap")
    assert(out.where(col("capped") && col("alloc_tokens") =!= col("n_tokens")).count() == 0,
      "a capped source not pinned to its cap")
    assert(out.where(col("epochs") > 1.0).count() == 0)
  }

  test("budget conserved through redistribution (whole-token rounding slack)") {
    val out = Sampling.budgetAllocation(spark, dir, alpha = 0.3,
      budgetFrac = 0.9, maxEpochs = 1.0)
    val row = out.agg(sum("alloc_tokens").as("alloc"), count(lit(1)).as("k")).head
    val total = Tables.documents(spark, dir)
      .agg(sum(graft.functions.TextFunctions.countTokens(col("text")))).head.getLong(0)
    val budget = 0.9 * total
    assert(math.abs(row.getLong(0) - budget) <= row.getLong(1),
      s"allocated ${row.getLong(0)} vs budget $budget beyond per-source rounding slack")
  }

  test("an ample budget with no cap pressure allocates proportional to weights") {
    val out = Sampling.budgetAllocation(spark, dir, alpha = 0.3,
      budgetFrac = 0.2, maxEpochs = 1.0)
    assert(out.where(col("capped")).count() == 0, "0.2x budget should cap nothing")
  }
}
