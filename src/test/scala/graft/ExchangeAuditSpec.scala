package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Info-only audit: shuffle-exchange count per query at sf0.001. Catches
  * accidental extra shuffles introduced by refactors (a hard ceiling
  * would be brittle across Spark versions, so this prints the counts and
  * asserts only a generous global bound per query). */
class ExchangeAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("shuffle census: no runaway plans") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // executedPlan (pre-execution AQE initial plan) prints Exchange
      // nodes inline; formatted mode hides the partitioning detail
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      (name, n)
    }
    counts.sortBy(-_._2).foreach { case (n, c) => info(f"$c%2d shuffles  $n") }
    assert(counts.map(_._2).sum > 0, "census counted nothing — counter is broken")
    // exact counts vary with which shared caches (MinHash sigs, shingles,
    // simhash) happen to be materialized when this suite runs — cached
    // subtrees replace their upstream exchanges. Worst measured plans:
    // q77 (degree histogram over the full verified-pair pipeline) 46
    // warm, ~55 cold; q62 (exact + multi-table LSH + IVF recall
    // composite) ~33 warm; q43 ~30 uncached. Single operators sit at
    // 0-7. The ceiling is a runaway tripwire (e.g. a lost broadcast
    // hint turning dim joins into shuffles everywhere), not a precision
    // gate — PlanSpec pins the per-operator shapes that matter.
    for ((name, n) <- counts)
      assert(n <= 64, s"$name shuffles $n times — check the plan")
  }
}
