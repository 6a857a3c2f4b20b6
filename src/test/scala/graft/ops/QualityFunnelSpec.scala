package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q114 invariants: the funnel is monotone (each rung keeps a subset of
  * the previous), token_frac is a fraction, and the LM thresholds
  * actually BIND (a degenerate threshold collapses the rung both ways). */
class QualityFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("rungs are monotone and token_frac is a fraction") {
    val bad = Curation.qualityFunnel(spark, dir)
      .where(col("n_pass_quality") > col("n_docs") ||
        col("n_pass_unigram") > col("n_pass_quality") ||
        col("n_pass_bigram") > col("n_pass_unigram") ||
        col("token_frac") < 0.0 || col("token_frac") > 1.0)
      .count()
    assert(bad == 0, s"$bad sources violate funnel monotonicity")
  }

  test("thresholds bind: impossible thresholds zero the rung, lax ones pass it through") {
    val strict = Curation.qualityFunnel(spark, dir, tUnigram = -1.0)
      .agg(sum("n_pass_unigram")).head.getLong(0)
    assert(strict == 0, "tUnigram=-1 should fail every doc")
    val lax = Curation.qualityFunnel(spark, dir, tUnigram = 1e6, tBigram = 1e6)
      .where(col("n_pass_bigram") =!= col("n_pass_quality")).count()
    // lax LM rungs may still drop docs with no bigram positions; none
    // exist in this corpus, so pass-through must be exact
    assert(lax == 0, "lax thresholds should make the LM rungs pass-through")
  }
}
