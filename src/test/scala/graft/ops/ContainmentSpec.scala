package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q112 invariants: containment dominates jaccard on every pair, the
  * contained side really is the smaller distinct-shingle set, and the
  * operator is a pure projection over the shared confirmedPairs stage
  * (no rebuild). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("containment >= jaccard on every reported pair, both in (0, 1]") {
    val bad = Dedup.containmentPairs(spark, dir, threshold = 0.0)
      .where(col("containment") < col("jaccard") ||
        col("containment") > 1.0 || col("jaccard") <= 0.0)
      .count()
    assert(bad == 0, s"$bad pairs violate containment >= jaccard in (0,1]")
  }

  test("doc_small has at most doc_big's distinct shingle count") {
    val n = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(Dedup.shingles(col("toks"))).as("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val bad = Dedup.containmentPairs(spark, dir, threshold = 0.0)
      .join(n.select(col("doc_id").as("doc_small"), col("n_sh").as("ns")), "doc_small")
      .join(n.select(col("doc_id").as("doc_big"), col("n_sh").as("nb")), "doc_big")
      .where(col("ns") > col("nb"))
      .count()
    assert(bad == 0, s"$bad pairs have the larger set reported as contained")
  }

  test("containment is served from the shared pair stage — no extra build") {
    Dedup.ngramJaccard(spark, dir).count() // force the stage
    val before = Dedup.pairsBuilds.get()
    Dedup.containmentPairs(spark, dir).count()
    assert(Dedup.pairsBuilds.get() == before,
      "containmentPairs rebuilt the pair stage instead of reusing it")
  }
}
