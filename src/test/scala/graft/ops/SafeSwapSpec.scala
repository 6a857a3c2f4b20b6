package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crash-safety of the compaction swaps (SafeSwap) and the bootstrap
  * contract of the delta appends.
  *
  * The compactions' crash windows are simulated by doing to the
  * artifact exactly what a crash mid-pass leaves behind (a live
  * partition renamed aside; a stale aside next to a completed swap) and
  * then driving the normal entry points — re-running the compaction, or
  * serving directly. Every path must converge to the same answers as a
  * cleanly compacted twin artifact; the old shape (delete-then-rename)
  * lost the moved partition's surviving rows permanently in window 1.
  */
class SafeSwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  /** A base+tombstone postings artifact over the sf0.001 corpus (10 %
    * deterministic delete set), NOT yet compacted. */
  private def buildTombstoned(out: String): Unit = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    Retrieval.savePostingsIndexOf(docs, out)
    Retrieval.tombstoneDocs(
      docs.where(pmod(col("doc_id") * lit(7919L), lit(100)) < 10).select("doc_id"), out)
  }

  test("crash window 1 (bucket aside, not replaced): re-run converges") {
    val crashed = tmpDir("graft-swap-c1")
    val clean = tmpDir("graft-swap-c1-twin")
    try {
      buildTombstoned(crashed)
      buildTombstoned(clean)
      Retrieval.compactPostings(spark, clean)
      // simulate the crash: one live bucket sits under postings.old and
      // is GONE from the live root — the state after `live → aside`
      // with no replacement yet
      val buckets = new java.io.File(s"$crashed/postings").listFiles()
        .filter(_.getName.startsWith("term_bucket=")).sortBy(_.getName)
      assert(buckets.nonEmpty)
      val victim = buckets.head
      val aside = new java.io.File(s"$crashed/postings.old")
      aside.mkdirs()
      assert(victim.renameTo(new java.io.File(aside, victim.getName)))
      // the owner re-runs the compaction: recover() restores the bucket
      // (tombstones still present — the commit point was never reached),
      // then the pass completes normally
      Retrieval.compactPostings(spark, crashed)
      assert(!new java.io.File(s"$crashed/postings.old").exists(),
        "recovery left the aside dir behind")
      assert(!new java.io.File(s"$crashed/tombstones").exists(),
        "the re-run compaction never committed")
      assert(rows(Retrieval.bm25TopKFromIndex(spark, crashed)) ==
        rows(Retrieval.bm25TopKFromIndex(spark, clean)),
        "crashed-then-recovered answers diverged from the clean compaction")
    } finally { rm(new java.io.File(crashed)); rm(new java.io.File(clean)) }
  }

  test("crash window 1 wholesale (dl aside): serving recovers in place") {
    val crashed = tmpDir("graft-swap-dl")
    val clean = tmpDir("graft-swap-dl-twin")
    try {
      buildTombstoned(crashed)
      buildTombstoned(clean)
      // simulate a crash in the dl swap: live dl moved aside, rewrite
      // not yet renamed in
      assert(new java.io.File(s"$crashed/dl")
        .renameTo(new java.io.File(s"$crashed/dl.old")))
      // a restarted READER hits the artifact directly: recover() must
      // restore dl before the scan; tombstones are still present, so
      // the serve-time anti-join keeps answers exact (= the
      // pre-compaction tombstoned serve)
      assert(rows(Retrieval.bm25TopKFromIndex(spark, crashed)) ==
        rows(Retrieval.bm25TopKFromIndex(spark, clean)),
        "serve-side recovery diverged from the uncrashed artifact")
    } finally { rm(new java.io.File(crashed)); rm(new java.io.File(clean)) }
  }

  test("crash window 2 (stale aside after a completed swap): live wins") {
    val crashed = tmpDir("graft-swap-c2")
    try {
      buildTombstoned(crashed)
      Retrieval.compactPostings(spark, crashed)
      val expected = rows(Retrieval.bm25TopKFromIndex(spark, crashed))
      // simulate: an aside COPY lingers next to the completed swap (the
      // crash fell between `next → live` and the aside cleanup). The
      // aside holds pre-compaction rows — resurrecting it would serve
      // deleted docs.
      val buckets = new java.io.File(s"$crashed/postings").listFiles()
        .filter(_.getName.startsWith("term_bucket=")).sortBy(_.getName)
      val victim = buckets.head
      val aside = new java.io.File(s"$crashed/postings.old")
      aside.mkdirs()
      val stale = new java.io.File(aside, victim.getName)
      java.nio.file.Files.walk(victim.toPath).forEach { p =>
        val dst = stale.toPath.resolve(victim.toPath.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) dst.toFile.mkdirs()
        else java.nio.file.Files.copy(p, dst)
      }
      assert(rows(Retrieval.bm25TopKFromIndex(spark, crashed)) == expected,
        "a stale aside changed the served answers")
      assert(!new java.io.File(s"$crashed/postings.old").exists(),
        "recovery kept the stale aside")
    } finally { rm(new java.io.File(crashed)) }
  }

  test("a first postings delta into an empty artifact bootstraps it") {
    val boot = tmpDir("graft-boot-postings")
    val full = tmpDir("graft-boot-postings-full")
    try {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      Retrieval.appendPostingsDelta(docs, boot) // no base build first
      Retrieval.savePostingsIndexOf(docs, full)
      assert(rows(Retrieval.bm25TopKFromIndex(spark, boot)) ==
        rows(Retrieval.bm25TopKFromIndex(spark, full)),
        "the bootstrap append diverged from a base build of the same docs")
    } finally { rm(new java.io.File(boot)); rm(new java.io.File(full)) }
  }

  test("a first PQ delta into a codebooks-only artifact bootstraps it") {
    val boot = tmpDir("graft-boot-pq")
    try {
      // train books + build on the full corpus, then strip the built
      // rows — what remains is exactly the codebooks-only artifact a
      // cold ingest starts from
      Similarity.savePqIndex(spark, dir, boot, nCoarse = 4, nSub = 2, m = 4, k = 16)
      val expected = rows(Similarity.pqTopKFromIndexCold(spark, boot,
        nQueries = 20, topK = 3))
      rm(new java.io.File(s"$boot/codes"))
      rm(new java.io.File(s"$boot/vectors"))
      Similarity.appendPqDelta(
        Similarity.unitEmbeddings(spark, dir).select("vec_id", "u"), boot)
      assert(rows(Similarity.pqTopKFromIndexCold(spark, boot,
        nQueries = 20, topK = 3)) == expected,
        "the PQ bootstrap append diverged from the original build")
    } finally { rm(new java.io.File(boot)) }
  }
}
