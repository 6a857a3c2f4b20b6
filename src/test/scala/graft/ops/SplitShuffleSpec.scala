package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant pins for the split/export additions: the leakage-safe
  * cluster-granular train/val split (q100) and the deterministic
  * training-export shuffle (q101). Value-level parity is the DuckDB
  * gate's job; these pin what the gate hash can't articulate — the
  * zero-leakage contract, its falsifiability (a naive doc-level split
  * DOES leak on the gate corpus), conservation, and that the export
  * permutation is genuinely order-sensitive and non-trivial.
  */
class SplitShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val gateDir = "/root/testdata/sf0.01"

  private def straddles(assign: org.apache.spark.sql.DataFrame): Long = {
    val pairs = Dedup.confirmedPairs(spark, gateDir)
      .where(col("jaccard") >= 0.5).select("doc_a", "doc_b")
    pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .where(col("split_a") =!= col("split_b"))
      .count()
  }

  test("cluster split: ZERO confirmed near-dup pairs straddle the boundary") {
    assert(straddles(Curation.clusterSplitAssign(spark, gateDir, 0.5, 90)) == 0L)
  }

  test("cluster split is load-bearing: a naive doc-hash split leaks on the same corpus") {
    // same hash rule applied at DOC granularity instead of cluster
    // granularity — if no pair straddles even this, the corpus carries
    // no cross-bucket near-dups and the zero above proves nothing
    val naive = Tables.documents(spark, gateDir).select(col("doc_id"),
      when(pmod(col("doc_id") * lit(2654435761L), lit(100)) < 50, "train")
        .otherwise("val").as("split"))
    assert(straddles(naive) > 0L,
      "no confirmed pair crosses a 50/50 doc-hash split at sf0.01 — " +
        "the leakage-free claim is untestable on this corpus")
  }

  test("cluster split conserves the corpus and splits it two ways") {
    val rows = Curation.clusterSplit(spark, gateDir).collect()
    val n = Tables.documents(spark, gateDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    assert(rows.map(_.getAs[String]("split")).distinct.sorted.sameElements(Array("train", "val")),
      "both splits must be populated at the gate scale")
  }

  test("export shuffle conserves the corpus over 16 gate-scale shards") {
    val rows = Sampling.exportShuffle(spark, gateDir).collect()
    val n = Tables.documents(spark, gateDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    val shards = rows.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s < 16))
    assert(shards.length > 1, "all docs in one shard — the hash key is degenerate")
  }

  test("export shuffle's checksum pins a NON-identity permutation") {
    // identity order (pos by doc_id) must disagree with the md5 order on
    // at least one shard — otherwise order_checksum pins nothing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    val identity = Tables.documents(spark, gateDir)
      .select(col("doc_id"),
        md5(concat(lit("shuffle|"), col("doc_id").cast("string"))).as("h"))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(sum(col("pos") * col("doc_id")).as("id_checksum"))
    val diff = Sampling.exportShuffle(spark, gateDir)
      .join(identity, Seq("shard"))
      .where(col("order_checksum") =!= col("id_checksum"))
      .count()
    assert(diff > 0, "md5 order equals doc_id order on every shard — no shuffle happened")
  }

  test("shard-count derivation holds population ~constant with exact plateau edges") {
    assert(Sampling.shardNibbles(500) == 1)
    assert(Sampling.shardNibbles(65536) == 1)
    assert(Sampling.shardNibbles(65537) == 2)
    assert(Sampling.shardNibbles(500000) == 2)
    assert(Sampling.shardNibbles(Long.MaxValue) == 8)
  }

  test("export shuffle plans one hash exchange on shard, no global sort") {
    val plan = Sampling.exportShuffle(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning(h"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
