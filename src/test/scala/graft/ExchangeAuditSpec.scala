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

  /** Count the shuffles that will actually RUN. A cached stage's
    * InMemoryRelation prints its rebuild lineage inline (exchanges that
    * never execute on the warm path — and nested cached stages print it
    * repeatedly), so string-counting over-counts; worse, the lineage's
    * finalized AdaptiveSparkPlan sections reset the indentation, so a
    * textual skip can't bound the block. Walk the plan TREE instead:
    * InMemoryTableScan is a leaf (traversal stops at the cache
    * boundary) and the AQE root's pre-execution plan is descended
    * explicitly. */
  private def executedShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    self + kids.map(executedShuffles).sum
  }

  test("shuffle census: no runaway plans") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, executedShuffles(fn(spark, dir).queryExecution.executedPlan))
    }
    counts.sortBy(-_._2).foreach { case (n, c) => info(f"$c%2d shuffles  $n") }
    assert(counts.map(_._2).sum > 0, "census counted nothing — counter is broken")
    // counts still vary a little with which session stages happen to be
    // materialized when this suite runs (a cold stage's build lineage
    // executes once), but the tree counter no longer charges cached
    // rebuild lineage to every consumer. Worst measured executed plans:
    // q62 (exact + LSH + IVF recall composite) 13; q72 (full curation
    // pipeline) 7; single operators sit at 0-7. The ceiling is a
    // runaway tripwire (e.g. a lost broadcast hint turning dim joins
    // into shuffles everywhere), not a precision gate — PlanSpec pins
    // the per-operator shapes that matter.
    // q123 is a UNION of id-range pages, each a bounded q119-shaped
    // batch — its executed total is pages × per-batch by design, so the
    // tripwire scales with the page count the build recorded; the
    // per-page budget is the invariant that must not creep
    val sweepPages = math.max(1, graft.ops.Retrieval.lastSweepBatches.get())
    for ((name, n) <- counts) {
      val cap = if (name == "q123_contamination_sweep") 32 * sweepPages else 32
      assert(n <= cap, s"$name shuffles $n times — check the plan")
    }
  }
}
