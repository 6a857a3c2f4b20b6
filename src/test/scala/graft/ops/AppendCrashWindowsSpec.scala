package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crash-point windows for the commit marker IN COMPOSITION — the
  * shared AppendCommit helper is pinned by AppendCommitSpec, but each
  * of the four multi-store wirings (BM25 postings+dl, image
  * bands+hashes, LSH buckets+vectors, PQ codes+vectors) has its own
  * write order, partitioning, and serve-entry recovery path. For every
  * family and every crash window between begin and commit, the family's
  * NORMAL serve entry must (a) roll both stores back byte-equivalent to
  * the pre-append state and (b) serve the pre-append answers; the
  * retried real append must then converge to exactly what a clean
  * (never-crashed) twin artifact serves, duplicate-free. */
class AppendCrashWindowsSpec extends AnyFunSuite {
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

  /** Land junk rows into a store exactly as an uncommitted append
    * would: the store's own rows re-appended under its own layout. */
  private def plant(indexDir: String, store: String,
      partitionCol: Option[String]): Unit = {
    val junk = spark.read.parquet(s"$indexDir/$store").limit(40)
    val w = junk.write.mode("append")
    partitionCol.fold(w)(w.partitionBy(_)).parquet(s"$indexDir/$store")
  }

  /** One multi-store family's lifecycle hooks. `derivedPart` is the
    * derived store's partition column (guard stores are flat). */
  private case class Family(
      name: String,
      derived: String, derivedPart: String, guard: String,
      build: (DataFrame, String) => Unit,
      append: (DataFrame, String) => Unit,
      serve: String => Seq[String],
      guardKey: String)

  private def exercise(f: Family, base: DataFrame, delta: DataFrame): Unit = {
    val inc = tmpDir(s"graft-crashwin-${f.name}")
    val twin = tmpDir(s"graft-crashwin-${f.name}-twin")
    try {
      f.build(base, inc)
      f.build(base, twin)
      val fs = fsOf(inc)
      val baseState = (listing(s"$inc/${f.derived}"), listing(s"$inc/${f.guard}"))
      val baseServe = f.serve(inc)
      // every window between begin and commit: marker only; derived
      // store partially appended; both stores appended (commit missing)
      for (window <- Seq("begin-only", "derived-partial", "both-stores")) {
        AppendCommit.begin(fs, inc, Seq(f.derived, f.guard))
        if (window != "begin-only") plant(inc, f.derived, Some(f.derivedPart))
        if (window == "both-stores") plant(inc, f.guard, None)
        // CRASH here (no commit). The family's normal serve entry must
        // recover before answering.
        assert(f.serve(inc) == baseServe,
          s"${f.name}/$window: the crashed append leaked into served answers")
        assert((listing(s"$inc/${f.derived}"), listing(s"$inc/${f.guard}")) == baseState,
          s"${f.name}/$window: rollback was not byte-equivalent")
        assert(!new java.io.File(s"$inc/_append_pending").exists,
          s"${f.name}/$window: the marker survived recovery")
      }
      // WARM window: a serve's resident state (if the family memoizes
      // any — PQ's loaded relations; the others re-read paths, but that
      // immunity is TESTED here, not assumed) must not outlive a
      // rollback that deletes files. Serve to warm, crash with both
      // stores appended, then serve TWICE: the first recovers (and must
      // drop any resident listings the rollback invalidated — the r14
      // PQ staleness class), the second answers from whatever stayed
      // resident.
      f.serve(inc)
      AppendCommit.begin(fs, inc, Seq(f.derived, f.guard))
      plant(inc, f.derived, Some(f.derivedPart))
      plant(inc, f.guard, None)
      assert(f.serve(inc) == baseServe,
        s"${f.name}/warm: the first post-crash serve diverged")
      assert(f.serve(inc) == baseServe,
        s"${f.name}/warm: a warm re-serve after the rollback diverged")
      assert((listing(s"$inc/${f.derived}"), listing(s"$inc/${f.guard}")) == baseState,
        s"${f.name}/warm: rollback was not byte-equivalent")
      // the retried REAL append converges: crashed-and-recovered ≡ a
      // clean twin that never crashed, with no duplicate guard ids
      f.append(delta, inc)
      f.append(delta, twin)
      assert(f.serve(inc) == f.serve(twin),
        s"${f.name}: the retried append diverged from the clean twin")
      val g = spark.read.parquet(s"$inc/${f.guard}")
      assert(g.count() == g.select(f.guardKey).distinct().count(),
        s"${f.name}: duplicate ${f.guardKey} rows in the guard store")
    } finally { rm(new java.io.File(inc)); rm(new java.io.File(twin)) }
  }

  private def incomingRule = pmod(col("doc_id") * lit(2654435761L), lit(100)) < 30
  private def docs = Tables.documents(spark, dir)
    .select(col("doc_id"), col("text"), incomingRule.as("incoming"))
  private def vecs = Similarity.unitEmbeddings(spark, dir)
    .select(col("vec_id"), col("u"),
      (pmod(col("vec_id") * lit(2654435761L), lit(100)) < 30).as("incoming"))

  test("BM25 postings+dl: every crash window rolls back; the retry converges") {
    exercise(Family("bm25", "postings", "term_bucket", "dl",
        (b, d) => Retrieval.savePostingsIndexOf(b, d),
        (x, d) => Retrieval.appendPostingsDelta(x, d),
        d => Retrieval.bm25TopKFromIndex(spark, d).collect().map(_.toString).toSeq,
        "doc_id"),
      docs.where(!col("incoming")).select("doc_id", "text"),
      docs.where(col("incoming")).select("doc_id", "text"))
  }

  test("image bands+hashes: every crash window rolls back; the retry converges") {
    exercise(Family("image", "bands", "band_bucket", "hashes",
        (b, d) => ImageIndex.saveImageHashIndexOf(Multimodal.imageHashesOf(b), d),
        (x, d) => ImageIndex.appendImageHashDelta(x, d),
        d => ImageIndex.imageDupsFromIndex(spark, d).collect().map(_.toString).toSeq,
        "doc_id"),
      docs.where(!col("incoming")).select("doc_id", "text"),
      docs.where(col("incoming")).select("doc_id", "text"))
  }

  test("LSH buckets+vectors: every crash window rolls back; the retry converges") {
    exercise(Family("lsh", "buckets", "bucket_bucket", "vectors",
        (b, d) => LshIndex.saveLshIndexOf(b, d),
        (x, d) => LshIndex.appendLshDelta(x, d),
        d => LshIndex.lshTopKFromIndex(spark, d).collect().map(_.toString).toSeq,
        "vec_id"),
      vecs.where(!col("incoming")).select("vec_id", "u"),
      vecs.where(col("incoming")).select("vec_id", "u"))
  }

  test("PQ codes+vectors: every crash window rolls back; the retry converges") {
    exercise(Family("pq", "codes", "cent_id", "vectors",
        (b, d) => Similarity.savePqIndexOf(b, d),
        (x, d) => Similarity.appendPqDelta(x, d),
        d => Similarity.pqTopKFromIndex(spark, d).collect().map(_.toString).toSeq,
        "vec_id"),
      vecs.where(!col("incoming")).select("vec_id", "u"),
      vecs.where(col("incoming")).select("vec_id", "u"))
  }
}
