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

  test("incremental re-export equals a full rewrite, byte-wise per shard file") {
    val incr = tmp("incr"); val full = tmp("full")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    def shardDirs(out: String): Map[String, java.io.File] =
      new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .map(f => f.getName -> f).toMap
    def shardBytes(d: java.io.File): Seq[Byte] = {
      val parts = d.listFiles().filter(_.getName.startsWith("part-"))
      assert(parts.length == 1,
        s"${d.getName}: expected exactly one data file, got ${parts.length}")
      java.nio.file.Files.readAllBytes(parts.head.toPath).toSeq
    }
    try {
      // corpus v1 = keepers minus an 'arriving tomorrow' slice
      val keepers = Curation.keeperDocs(spark, dir)
      val added = keepers.where(pmod(col("doc_id"), lit(11)) === 0)
      val v1 = keepers.where(pmod(col("doc_id"), lit(11)) =!= 0)
      Export.writeTrainingShardsOf(spark, v1, incr)
      val before = shardDirs(incr).map { case (n, d) =>
        n -> d.listFiles().map(f => (f.getName, f.length())).toSet
      }
      // tomorrow: the slice admits; only its shards may rewrite
      val mIncr = Export.writeTrainingShardsIncrementalOf(
        spark, keepers, incr, added.select("doc_id")).collect().map(_.toString).toSeq
      val mFull = Export.writeTrainingShardsOf(spark, keepers, full)
        .collect().map(_.toString).toSeq
      assert(mIncr == mFull, "incremental manifest diverged from the full rewrite's")
      val di = shardDirs(incr); val df2 = shardDirs(full)
      assert(di.keySet == df2.keySet, "shard dir sets diverged")
      di.keySet.foreach { n =>
        assert(shardBytes(di(n)) == shardBytes(df2(n)),
          s"$n: incremental shard bytes diverged from the full rewrite")
      }
      // untouched shards were not rewritten: same files, byte for byte
      val touched = added
        .select(conv(substring(md5(concat(lit("shuffle|"),
            col("doc_id").cast("string"))), 1, 1), 16, 10).cast("long").as("s"))
        .distinct().collect().map(r => s"shard=${r.getLong(0)}").toSet
      val untouched = before.keySet -- touched
      assert(untouched.nonEmpty, "vacuous: every shard was touched")
      untouched.foreach { n =>
        assert(di(n).listFiles().map(f => (f.getName, f.length())).toSet == before(n),
          s"$n: an untouched shard's files were rewritten")
      }
      // the shipped artifact still passes its own integrity check
      assert(Export.verifyShards(spark, incr).isEmpty)
      // a delta naming no new docs is a manifest-only no-op
      import spark.implicits._
      val noop = Export.writeTrainingShardsIncrementalOf(spark, keepers, incr,
        Seq.empty[Long].toDF("doc_id")).collect().map(_.toString).toSeq
      assert(noop == mFull)
      // the RETIRE direction: the slice leaves the corpus again; the
      // same touched-shard rewrite must shrink those shards back to a
      // fresh v1 export (a takedown's shards rewrite, nothing else)
      val mBack = Export.writeTrainingShardsIncrementalOf(
        spark, v1, incr, added.select("doc_id")).collect().map(_.toString).toSeq
      val v1Full = tmp("v1full")
      try {
        val mV1 = Export.writeTrainingShardsOf(spark, v1, v1Full)
          .collect().map(_.toString).toSeq
        assert(mBack == mV1,
          "retiring the slice diverged from a fresh export without it")
        val db = shardDirs(incr); val dv = shardDirs(v1Full)
        assert(db.keySet == dv.keySet)
        db.keySet.foreach { n =>
          assert(shardBytes(db(n)) == shardBytes(dv(n)),
            s"$n: post-retire shard bytes diverged from the fresh export")
        }
      } finally rm(new java.io.File(v1Full))
    } finally { rm(new java.io.File(incr)); rm(new java.io.File(full)) }
  }
}
