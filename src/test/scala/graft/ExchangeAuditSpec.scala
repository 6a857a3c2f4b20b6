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

  test("no query shuffles more than 8 times; report the census") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // executedPlan (pre-execution AQE initial plan) prints Exchange
      // nodes inline; formatted mode hides the partitioning detail
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      (name, n)
    }
    counts.sortBy(-_._2).foreach { case (n, c) => info(f"$c%2d shuffles  $n") }
    assert(counts.map(_._2).sum > 0, "census counted nothing — counter is broken")
    // current census tops: q43 hybrid (13) and q33 (11) — both compose the
    // LSH candidate pipeline (sigs → bands → candidates → exact-Jaccard →
    // embedding join), each stage a narrow shuffle over candidates/sigs,
    // never the corpus pair-space. Single-operator queries sit at ≤ 3.
    val limits = Map("q43_hybrid_neardup" -> 14, "q33_ngram_jaccard" -> 12,
      "q39_ann_ivf" -> 8).withDefaultValue(6)
    for ((name, n) <- counts)
      assert(n <= limits(name), s"$name shuffles $n times (limit ${limits(name)}) — check the plan")
  }
}
