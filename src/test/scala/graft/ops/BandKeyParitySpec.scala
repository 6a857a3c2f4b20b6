package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The per-row (streaming) MinHash banding must produce byte-identical
  * (doc_id, band, band_key) rows to the batch signature-stage banding —
  * otherwise the ingest gate and the batch pair stage silently disagree
  * on what collides. */
class BandKeyParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("row-wise band keys equal the batch banding on every corpus doc") {
    val docs = Tables.documents(spark, dir)
    val rowKeys = docs
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.rowDigests(col("toks")).as("hs"))
      .select(col("doc_id"), explode(Dedup.rowBandKeys(col("hs"))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val batchKeys = Dedup.bandsOf(Dedup.minhashSignatures(spark, dir), 8, 2)
    assert(rowKeys.count() == batchKeys.count())
    assert(rowKeys.except(batchKeys).isEmpty && batchKeys.except(rowKeys).isEmpty,
      "row-wise and batch band keys diverge")
  }

  test("digest array is bound before slicing (one md5 pass per shingle, not k)") {
    // the plan must show the slice minima reading a column reference,
    // not k inlined md5-transforms: count md5 occurrences in the
    // analyzed plan of the two-stage build — nDigests per shingle in
    // one transform + one per band key, never k*nDigests
    val docs = Tables.documents(spark, dir).limit(1)
    val staged = docs
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.rowDigests(col("toks")).as("hs"))
      .select(col("doc_id"), explode(Dedup.rowBandKeys(col("hs"))).as("bk"))
    val plan = staged.queryExecution.optimizedPlan.toString
    val md5s = "md5".r.findAllIn(plan).size
    // 2 seeded digests in the rowDigests transform + 4 band-key md5s = 6;
    // a collapsed plan that re-inlines the digest transform into each of
    // the 8 slice minima would show 8x2 (+4) = 20
    assert(md5s <= 8, s"digest transform re-inlined into slice minima ($md5s md5 nodes):\n" +
      plan.take(1200))
  }
}
