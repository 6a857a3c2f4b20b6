package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive TWO-LEVEL sizing contract
  * ([[Similarity.adaptiveTwoLevelConfig]]): codebook shape (nCoarse,
  * nSub) holds total list count at n/1024 with the coarse side clamped
  * broadcastable, and the probe budget (nProbe1, nProbe2) is the
  * measured recall knob — constants from the IvfCeilingProbe sweep
  * (BASELINE.md round-10 table), not asserted. The flat path's
  * [[AdaptiveIvfSpec]] discipline, one level up. */
class AdaptiveTwoLevelSpec extends AnyFunSuite {

  test("codebook shape: list count ~ n/1024, coarse side 4x sqrt, both clamped") {
    // probe budgets are the measured recall-1.0 policy: whole probed
    // cells (nProbe2 = nSub), nProbe1 = max(4, nCoarse/64) — see the
    // BASELINE.md round-10 sweep tables (recall is a function of
    // nProbe2 alone; (4, nSub) measured 1.000 at 2 M AND 8 M)
    // gate corpus (500 vectors): the floor config
    assert(Similarity.adaptiveTwoLevelConfig(500L) ==
      Similarity.TwoLevelConfig(16, 4, 16, 4)) // 64 lists: full scan
    // 100x corpus (200 k vectors): 56 x 4 = 224 lists (target 196)
    assert(Similarity.adaptiveTwoLevelConfig(200000L) ==
      Similarity.TwoLevelConfig(56, 4, 4, 4))
    // 2 M (ceiling-probe point): 177 x 12 = 2124 lists — exactly the
    // list count the round-9 probe table reports at 2 M
    assert(Similarity.adaptiveTwoLevelConfig(2000000L) ==
      Similarity.TwoLevelConfig(177, 12, 4, 12))
    // 8 M (past the flat 4096 cap — the regime this config exists for):
    // 354 x 23 = 8142 lists, ~983-row lists at any n
    assert(Similarity.adaptiveTwoLevelConfig(8000000L) ==
      Similarity.TwoLevelConfig(354, 23, 5, 23))
    // 10^9: coarse still under its cap (3953), lists ~ n/1024 held
    val b = Similarity.adaptiveTwoLevelConfig(1000000000L)
    assert(b.nCoarse == 3953 && b.nSub == 248)
    assert(math.abs(b.nCoarse.toLong * b.nSub - 1000000000L / 1024) < 1000000000L / 1024 / 10)
  }

  test("extreme regime: both sides clamp at 4096 (bounded broadcast/plan objects)") {
    val c = Similarity.adaptiveTwoLevelConfig(100000000000L) // 10^11
    assert(c.nCoarse == 4096, "coarse codebook must stay broadcastable")
    assert(c.nSub == 4096, "per-cell sub-book must stay a bounded plan reference")
  }

  test("the adaptive path answers with full recall at the gate corpus") {
    // at 500 vectors the adaptive probe budget (16 x 4) covers the whole
    // 16 x 4 codebook — the adaptive path must degrade gracefully to
    // exact top-k at tiny corpora, not break on nProbe > nCells
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.bruteForceTopK(spark, dir, nQueries = 20, k = 3)
      .select("q_id", "neighbor_id")
    val adaptive = Similarity.twoLevelIvfTopKAdaptive(spark, dir, nQueries = 20, k = 3)
      .select("q_id", "neighbor_id")
    assert(exact.exceptAll(adaptive).count() == 0,
      "full-budget adaptive probe at a tiny corpus must equal exact top-k")
  }
}
