package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The multi-store append commit marker: a crash anywhere between
  * AppendCommit.begin and .commit must roll every store back to its
  * recorded listing at the next recover — the append is atomic to any
  * observer, no duplicate rows ever exist, and the re-run re-admits the
  * whole delta. */
class AppendCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def listing(root: String): Set[(String, Long)] = {
    val out = scala.collection.mutable.Set.empty[(String, Long)]
    def walk(f: java.io.File, rel: String): Unit =
      Option(f.listFiles()).foreach(_.foreach { c =>
        val r = if (rel.isEmpty) c.getName else rel + "/" + c.getName
        if (c.isDirectory) walk(c, r) else out += ((r, c.length()))
      })
    walk(new java.io.File(root), "")
    out.toSet
  }

  test("recover rolls an uncommitted partial append back to the recorded state") {
    val work = tmpDir("graft-appendcommit")
    try {
      import spark.implicits._
      val fs = fsOf(work)
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
        .write.partitionBy("v").parquet(s"$work/a")
      Seq((1L, 0.5)).toDF("id", "w").write.parquet(s"$work/b")
      val before = (listing(s"$work/a"), listing(s"$work/b"))
      AppendCommit.begin(fs, work, Seq("a", "b", "c"))
      // the partial append: new files in an existing partition, a brand
      // new partition in a, and a brand new store c; b never written
      Seq((3L, "x"), (4L, "z")).toDF("id", "v")
        .write.mode("append").partitionBy("v").parquet(s"$work/a")
      Seq((9L, "q")).toDF("id", "v").write.parquet(s"$work/c")
      // CRASH (no commit). recover must restore the exact pre-state.
      AppendCommit.recover(fs, work)
      assert((listing(s"$work/a"), listing(s"$work/b")) == before,
        "rollback did not restore the recorded store listings")
      assert(!new java.io.File(s"$work/a/v=z").exists,
        "a partition born by the crashed append survived")
      assert(!new java.io.File(s"$work/c").exists,
        "a store born by the crashed append survived")
      assert(!new java.io.File(s"$work/_append_pending").exists)
      // idempotent + no-op without a marker
      AppendCommit.recover(fs, work)
      assert((listing(s"$work/a"), listing(s"$work/b")) == before)
      // a crash INSIDE begin (tmp marker only) is swept with no effect
      java.nio.file.Files.write(
        java.nio.file.Paths.get(work, "_append_pending.tmp"), "junk".getBytes)
      AppendCommit.recover(fs, work)
      assert(!new java.io.File(s"$work/_append_pending.tmp").exists)
      assert((listing(s"$work/a"), listing(s"$work/b")) == before)
    } finally rm(new java.io.File(work))
  }

  test("a crashed LSH delta append rolls back; the retried append converges duplicate-free") {
    val inc = tmpDir("graft-appendcommit-lsh")
    val full = tmpDir("graft-appendcommit-lsh-full")
    try {
      val fs = fsOf(inc)
      val vecs = Similarity.unitEmbeddings(spark, dir)
      val split = vecs.withColumn("incoming",
        pmod(col("vec_id") * lit(2654435761L), lit(100)) < 30)
      LshIndex.saveLshIndexOf(split.where(!col("incoming")).select("vec_id", "u"), inc)
      val baseServe = LshIndex.lshTopKFromIndex(spark, inc)
        .collect().map(_.toString).toSeq
      val baseBuckets = spark.read.parquet(s"$inc/buckets").count()
      // simulate the crash window: marker down, derived store partially
      // appended (junk rows that MUST vanish), guard store untouched
      AppendCommit.begin(fs, inc, Seq("buckets", "vectors"))
      spark.read.parquet(s"$inc/buckets").limit(50)
        .write.mode("append").partitionBy("bucket_bucket").parquet(s"$inc/buckets_tmp_x")
      // move the junk in as an uncommitted append would land it
      val junk = spark.read.parquet(s"$inc/buckets_tmp_x")
      junk.write.mode("append").partitionBy("bucket_bucket").parquet(s"$inc/buckets")
      fsOf(inc).delete(new org.apache.hadoop.fs.Path(s"$inc/buckets_tmp_x"), true)
      assert(spark.read.parquet(s"$inc/buckets").count() == baseBuckets + 50)
      // CRASH. Serving now must first roll the partial append back:
      assert(LshIndex.lshTopKFromIndex(spark, inc)
        .collect().map(_.toString).toSeq == baseServe,
        "a crashed append leaked into the served answers")
      assert(spark.read.parquet(s"$inc/buckets").count() == baseBuckets,
        "rollback left duplicate bucket rows behind")
      // the retried delta now lands wholesale and equals a full rebuild
      LshIndex.appendLshDelta(split.where(col("incoming")).select("vec_id", "u"), inc)
      LshIndex.saveLshIndex(spark, dir, full)
      assert(LshIndex.lshTopKFromIndex(spark, inc).collect().map(_.toString).toSeq ==
        LshIndex.lshTopKFromIndex(spark, full).collect().map(_.toString).toSeq,
        "the retried append diverged from a full rebuild")
      val b = spark.read.parquet(s"$inc/buckets")
      assert(b.count() == b.dropDuplicates("vec_id", "tbl", "bucket").count(),
        "duplicate bucket rows survived the commit-marker lifecycle")
    } finally { rm(new java.io.File(inc)); rm(new java.io.File(full)) }
  }
}
