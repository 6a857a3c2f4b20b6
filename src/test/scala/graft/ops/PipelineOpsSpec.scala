package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant pins for the round-7 pipeline additions: incremental
  * near-dedup (q96), the unigram-LM quality proxy (q97), and the
  * temperature source-mixing plan (q98). Value-level parity is the
  * DuckDB gate's job; these specs pin the semantic invariants the gate's
  * hash can't articulate — conservation, bounds, and falsifiability
  * (the queries must actually discriminate on the gate corpus, not
  * return degenerate all-equal columns).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val gateDir = "/root/testdata/sf0.01"

  test("incremental dedup conserves the batch: incoming = corpus-dup + batch-dup + kept") {
    val rows = Dedup.incrementalDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val inc = r.getAs[Long]("n_incoming")
      val sum = r.getAs[Long]("n_dup_corpus") + r.getAs[Long]("n_dup_batch") +
        r.getAs[Long]("n_kept")
      assert(inc == sum, s"${r.getAs[String]("source")}: $inc != $sum")
      assert(r.getAs[Long]("n_dup_corpus") >= 0 && r.getAs[Long]("n_dup_batch") >= 0)
    }
  }

  test("incremental dedup's batch split matches the deterministic hash rule") {
    val expected = Tables.documents(spark, dir)
      .where(pmod(col("doc_id") * lit(2654435761L), lit(100)) < 30).count()
    val reported = Dedup.incrementalDedup(spark, dir)
      .agg(sum("n_incoming")).collect()(0).getLong(0)
    assert(reported == expected)
  }

  test("incremental dedup actually kills near-dups at the gate scale (falsifiability)") {
    // the sf0.01 corpus carries near-dup pairs on both sides of the 30%
    // split (7 cross-split + 3 within-batch at threshold 0.5, verified
    // against brute-force Jaccard) — a dedup that reports zero kills
    // here is broken even if per-source arithmetic balances
    val agg = Dedup.incrementalDedup(spark, gateDir)
      .agg(sum("n_dup_corpus").as("c"), sum("n_dup_batch").as("b")).collect()(0)
    assert(agg.getAs[Long]("c") > 0, "no vs-corpus kills at sf0.01")
    assert(agg.getAs[Long]("b") > 0, "no within-batch kills at sf0.01")
  }

  test("incremental dedup plans no cartesian product") {
    val plan = Dedup.incrementalDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("unigram NLL sits inside its information-theoretic bounds and discriminates") {
    // each token's NLL is ln(total/count) with 1 <= count <= total, so
    // the per-doc mean must land in [0, ln(total)]
    val rows = TextAnalysis.unigramLogprob(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val bound = math.log(total.toDouble)
    for (r <- rows) {
      val nll = r.getAs[Double]("nll")
      assert(nll >= 0.0 && nll <= bound, s"doc ${r.getAs[Long]("doc_id")}: nll=$nll")
    }
    assert(rows.map(_.getAs[Double]("nll")).distinct.length > 1,
      "NLL is constant across documents — the proxy discriminates nothing")
  }

  test("source mixing is a probability distribution that up-weights small sources") {
    val rows = Sampling.sourceMixing(spark, dir).collect()
    assert(rows.nonEmpty)
    val pSum = rows.map(_.getAs[Double]("mix_p")).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"mix_p sums to $pSum")
    // alpha = 0.5 < 1: epochs ∝ tokens^(alpha-1) strictly favors the
    // smaller source — the entire point of temperature mixing
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("epochs") >= bySize.last.getAs[Double]("epochs"),
      "smallest source should see at least as many epochs as the largest")
    for (r <- rows) assert(r.getAs[Double]("epochs") > 0.0)
  }
}
