package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The materialized export must be (a) exactly the accounted corpus,
  * (b) deterministic to the byte-order level across re-runs, and
  * (c) free of eval/contaminated docs — the leakage contract carried
  * all the way to the shipped artifact. */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-export-$tag").toString

  test("shipped shards are exactly the accounted keeper corpus, deterministically") {
    val out1 = tmp("a"); val out2 = tmp("b")
    val manifest1 = Export.writeTrainingShards(spark, dir, out1).collect()
    val manifest2 = Export.writeTrainingShards(spark, dir, out2).collect()
    assert(manifest1.nonEmpty)
    // determinism: the manifests (incl. position-sensitive checksums) match
    assert(manifest1.sameElements(manifest2))

    val shipped = spark.read.parquet(out1)
    val keepers = Curation.keeperDocs(spark, dir)
    // membership: shipped ids == keeper ids
    val shippedIds = shipped.select("doc_id").collect().map(_.getLong(0)).toSet
    val keeperIds = keepers.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shippedIds == keeperIds)
    // accounting: manifest totals == q72's accounting totals
    val q72docs = Curation.curate(spark, dir)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(manifest1.map(_.getAs[Long]("n_docs")).sum == q72docs)
    // per-shard row ORDER reproduces across exports (one file per shard,
    // parquet preserves file row order)
    val shards = manifest1.map(_.getAs[Long]("shard"))
    for (s <- shards.take(4)) {
      def orderOf(out: String) = spark.read
        .parquet(s"$out/shard=$s").select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(orderOf(out1) == orderOf(out2), s"shard $s order diverged")
    }
    // leakage: no eval-holdout doc and no contaminated doc ships
    assert(!shippedIds.exists(_ % 97 == 0), "eval holdout leaked into the export")
    val contaminated = TextAnalysis.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shippedIds.intersect(contaminated).isEmpty, "contaminated docs shipped")
    // the manifest rides inside the output dir but is invisible to readers
    assert(new java.io.File(s"$out1/_manifest").exists)
    assert(!shipped.columns.contains("order_checksum"))

    // receiver-side integrity: a clean artifact verifies empty...
    assert(Export.verifyShards(spark, out1).collect().isEmpty)
    // ...and a missing shard surfaces as a discrepancy row
    val victim = s"$out2/shard=${shards.head}"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(victim))
    val bad = Export.verifyShards(spark, out2).collect()
    assert(bad.exists(r => r.getAs[Long]("shard") == shards.head && r.isNullAt(2)),
      s"missing shard not flagged: ${bad.mkString(", ")}")
  }
}
