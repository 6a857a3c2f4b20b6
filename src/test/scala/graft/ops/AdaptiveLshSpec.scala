package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive ANN-LSH sizing contract ([[Similarity.adaptiveLshConfig]]):
  * the default `lshTopK` path derives (bits, nTables) from the corpus row
  * count so bucket population stays ~constant as the corpus grows — the
  * fix for the fixed-8-bit default that ran 29–62 s at 200k vectors while
  * the 12-bit config (q92) did the same work in ~2.9 s at equal recall.
  *
  * The (8, 8) PLATEAU matters operationally: q38's and q62's DuckDB
  * oracles are static SQL pinned at 8×8, so the derivation must resolve
  * to exactly (8, 8) at the correctness gate's corpus size (500 vectors
  * at sf0.01) — and must keep doing so if the driver regenerates testdata
  * with somewhat different row counts. The plateau spans n ≤ 4096, an 8×
  * headroom band, and its edges are exact (integer ceil-log2, no
  * floating-point log whose ulp could flip a boundary).
  *
  * Bucket keys are seeded random-hyperplane dot-signs, independent per
  * (table, bit) — so the ladder runs to 20 bits with a FULL 8 tables at
  * every rung (the former dim-slice keys spent the 64-dim budget:
  * bits × tables ≤ 64 clamped the ladder at 12 bits and starved tables
  * above 8 bits).
  */
class AdaptiveLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the (8,8) oracle plateau spans the gate corpus with headroom") {
    // every count in the plateau band derives the oracle-pinned config
    for (n <- Seq(1L, 100L, 500L, 2000L, 4096L))
      assert(Similarity.adaptiveLshConfig(n) == (8, 8), s"n=$n")
    // first count past the plateau widens by exactly one bit — and keeps
    // all 8 tables (the dim-slice budget would have dropped one)
    assert(Similarity.adaptiveLshConfig(4097L) == (9, 8))
  }

  test("large corpora widen bits past the former 12-bit dim-budget clamp") {
    assert(Similarity.adaptiveLshConfig(20000L) == (11, 8))
    assert(Similarity.adaptiveLshConfig(200000L) == (14, 8)) // 100x corpus
    assert(Similarity.adaptiveLshConfig(2000000L) == (17, 8))
    // the 20-bit clamp: probe-ladder growth (~bits^2/2 masks), not a
    // dim budget — past it the lever is more tables / deeper probes
    assert(Similarity.adaptiveLshConfig(100000000L) == (20, 8))
  }

  test("bucket population stays ~bounded across the ladder") {
    for (n <- 1L to 26L) {
      val (b, t) = Similarity.adaptiveLshConfig(1L << n)
      assert(b >= 8 && b <= 20 && t == 8, s"n=2^$n -> ($b, $t)")
      // expected per-table bucket population n / 2^bits <= 16 while the
      // clamp is not binding (ceil-log2 targets population 16)
      if (b < 20) assert(((1L << n) >> b) <= 16, s"n=2^$n -> ($b, $t)")
    }
  }

  test("the default lshTopK path equals the explicit 8x8 config at gate scale") {
    val dir = "/root/testdata/sf0.001" // 500 vectors -> derives (8, 8)
    val derived = Similarity.lshTopK(spark, dir, nQueries = 20)
      .collect().map(_.toSeq).toSeq
    val pinned = Similarity.lshTopK(spark, dir, nQueries = 20, bits = 8, nTables = 8)
      .collect().map(_.toSeq).toSeq
    assert(derived == pinned)
  }
}
