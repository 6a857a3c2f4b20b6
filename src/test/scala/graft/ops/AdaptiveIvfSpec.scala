package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive IVF sizing contract ([[Similarity.adaptiveIvfConfig]]):
  * the default `ivfTopK` path derives the codebook size from the corpus
  * row count so inverted-list length — and with it scanned rows per
  * query (nProbe × n/nCentroids) — stays ~constant as the corpus grows.
  * The fix for the fixed 16-centroid default, whose scanned fraction
  * nProbe/nCentroids = 8/16 meant every query touched HALF the corpus:
  * linear per-query cost in n, the same fixed-constant scale cliff
  * [[Similarity.adaptiveLshConfig]] closed for the LSH rung in round 7.
  *
  * The 16-centroid PLATEAU matters operationally: q39's and q62's DuckDB
  * oracles are static SQL pinned at 16 centroids, so the derivation must
  * resolve to exactly 16 at the correctness gate's corpus size (500
  * vectors at sf0.01) — and must keep doing so if the driver regenerates
  * testdata with somewhat different row counts. The plateau spans
  * n ≤ 16384, a 32× headroom band, and its edges are exact (integer
  * ceil division, no floating-point whose ulp could flip a boundary).
  */
class AdaptiveIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the 16-centroid oracle plateau spans the gate corpus with headroom") {
    // every count in the plateau band derives the oracle-pinned config
    for (n <- Seq(1L, 100L, 500L, 2000L, 16384L))
      assert(Similarity.adaptiveIvfConfig(n) == 16, s"n=$n")
    // first count past the plateau widens by exactly one list
    assert(Similarity.adaptiveIvfConfig(16385L) == 17)
  }

  test("large corpora hold the inverted-list length ~constant") {
    assert(Similarity.adaptiveIvfConfig(65536L) == 64) // the q120 gate config's regime
    assert(Similarity.adaptiveIvfConfig(200000L) == 196) // 100x corpus: 8/196 ~ 4% scanned
    // the 4096 cap: a ~2 MB codebook still broadcasts freely; beyond it
    // the lever is a two-level coarse quantizer, not a wider flat codebook
    assert(Similarity.adaptiveIvfConfig(100000000L) == 4096)
  }

  test("scanned fraction at nProbe=8 is bounded once past the plateau") {
    for (n <- Seq(32768L, 100000L, 1000000L, 4194304L)) {
      val c = Similarity.adaptiveIvfConfig(n)
      // nProbe lists of ~n/c vectors each: bounded by ~8 * 1024 rows
      // (plus the per-list ceil remainder) while the cap is not binding
      val scannedPerQuery = 8L * ((n + c - 1) / c)
      assert(scannedPerQuery <= 8L * 1100L, s"n=$n -> c=$c scans $scannedPerQuery")
    }
  }

  test("the default ivfTopK path equals the explicit 16-centroid config at gate scale") {
    val dir = "/root/testdata/sf0.001" // 500 vectors -> derives 16
    val derived = Similarity.ivfTopK(spark, dir, nQueries = 20)
      .collect().map(_.toSeq).toSeq
    val pinned = Similarity.ivfTopK(spark, dir, nCentroids = 16, nQueries = 20)
      .collect().map(_.toSeq).toSeq
    assert(derived == pinned)
  }
}
