package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Falsifiability for q95 (corpus-scale embedding near-dup via sign-LSH
  * buckets), the q62 discipline applied to the pair path:
  *
  *  1. Against the exact pair set on the real gate corpus. The synthetic
  *     embeddings hold NO true near-duplicates (max pair cosine ≈ 0.51),
  *     so the default threshold 0.4 operates sign-LSH in its hardest
  *     regime — pairs ~60° apart collide in a table only rarely. The
  *     spec pins (a) soundness: every emitted pair IS an exact-cosine
  *     match (candidates are scored exactly, so precision is 1 by
  *     construction — verified anyway), and (b) the measured recall
  *     floor of that worst-case regime.
  *
  *  2. Against PLANTED near-duplicates — the regime the operator is FOR
  *     (copies, re-encodes, crawl mirrors: cosine → 1). Each planted
  *     copy sits ~0.04 rad from its source, where per-table collision
  *     is ~0.9 and missing all 8 tables has probability ~1e-8 — the
  *     spec demands ≥ 0.95 recall, and the data is deterministic so
  *     this is a fixed outcome, not a flaky sample.
  */
class AnnNearDupRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q95 is sound and meets the worst-case-regime recall floor vs exact pairs") {
    // exact pair set over the WHOLE corpus (500 vectors at sf0.001)
    val exact = pairSet(Similarity.nearDup(spark, dir, limit = 1000, threshold = 0.4))
    val lsh = pairSet(Similarity.nearDupLsh(spark, dir, threshold = 0.4))
    assert(exact.nonEmpty)
    // soundness: LSH emits only true threshold pairs (exact scoring on
    // candidates — a false positive here means the scorer broke)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    // worst-case-regime floor: ~60-degree pairs rarely share a sign
    // bucket; measured 16/59 ≈ 0.27 at (8,8) on this corpus. The pin is
    // a tripwire for candidate-generation regressions (e.g. a broken
    // bucket key collapsing recall to ~0), not a quality target — the
    // operator's quality regime is the planted-duplicate test below.
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.15, f"worst-case recall $recall%.3f fell below the floor")
    info(f"worst-case regime (cos>=0.4, no true near-dups): recall $recall%.3f over ${exact.size} exact pairs")
  }

  test("q95 finds planted near-duplicates (the cos->1 regime) at >= 0.95 recall") {
    val n = 100
    val e = Tables(spark, dir, "embeddings").where(col("vec_id") < n)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def unit(df: DataFrame): DataFrame = df
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
    val base = unit(e)
    // deterministic jitter ~0.04 rad: component i moves by 0.005*((i%3)-1)
    val copies = unit(
      base.select((col("vec_id") + lit(100000L)).as("vec_id"),
        transform(col("u"), (x, i) => x + lit(0.005) * ((i % 3).cast("double") - 1.0)).as("v")))
    val sig = Similarity.lshSignaturesOf(base.unionAll(copies), bits = 8, nTables = 8)
    val found = pairSet(
      Similarity.nearDupPairsOf(sig, threshold = 0.99, maxBucketPopulation = 1000))
    val planted = (0L until n).map(i => (i, i + 100000L)).toSet
    val recall = planted.intersect(found).size.toDouble / n
    assert(recall >= 0.95, f"planted-duplicate recall $recall%.3f — bucket collision broke")
    info(f"planted near-dup regime: recall $recall%.3f over $n pairs")
  }
}
