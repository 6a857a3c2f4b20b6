package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive ANN-LSH sizing contract ([[Similarity.adaptiveLshConfig]]):
  * the default `lshTopK` path derives (bits, nTables) from the corpus row
  * count so bucket population stays ~constant as the corpus grows — the
  * fix for the fixed-8-bit default that ran 29–62 s at 200k vectors while
  * the 12×5 config (q92) did the same work in ~2.9 s at equal recall.
  *
  * The (8, 8) PLATEAU matters operationally: q38's and q62's DuckDB
  * oracles are static SQL pinned at 8×8, so the derivation must resolve
  * to exactly (8, 8) at the correctness gate's corpus size (500 vectors
  * at sf0.01) — and must keep doing so if the driver regenerates testdata
  * with somewhat different row counts. The plateau spans n ≤ 4096, an 8×
  * headroom band, and its edges are exact (integer ceil-log2, no
  * floating-point log whose ulp could flip a boundary).
  */
class AdaptiveLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the (8,8) oracle plateau spans the gate corpus with headroom") {
    // every count in the plateau band derives the oracle-pinned config
    for (n <- Seq(1L, 100L, 500L, 2000L, 4096L))
      assert(Similarity.adaptiveLshConfig(n) == (8, 8), s"n=$n")
    // first count past the plateau widens by exactly one bit
    assert(Similarity.adaptiveLshConfig(4097L) == (9, 7))
  }

  test("large corpora land on the measured q92 scale config") {
    assert(Similarity.adaptiveLshConfig(20000L) == (11, 5))
    assert(Similarity.adaptiveLshConfig(200000L) == (12, 5)) // 100x corpus
    // the 12-bit clamp: the 64-dim budget is spent, not a scale claim
    assert(Similarity.adaptiveLshConfig(100000000L) == (12, 5))
  }

  test("bits x tables stays within the 64-dim disjoint-range budget") {
    for (n <- 1L to 22L) {
      val (b, t) = Similarity.adaptiveLshConfig(1L << n)
      assert(b * t <= 64, s"n=2^$n -> ($b, $t)")
      assert(b >= 8 && b <= 12 && t >= 5, s"n=2^$n -> ($b, $t)")
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
