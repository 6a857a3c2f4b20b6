package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavior pins for q103 (winnowed duplicated-span profile) and the
  * cross-query consistency of the q102/q104 profile layers.
  *
  * The q103 planted case is the one a strided fixed-offset scheme FAILS:
  * two documents share a long run at alignments differing by an offset
  * that is not a multiple of any stride. Winnowing's guarantee (Schleimer
  * et al. 2003) is that any shared run of >= k+w-1 chars yields a shared
  * selected fingerprint at ANY pair of alignments — so the pin is not
  * just "the operator finds a duplicate" but "the operator finds the
  * alignment-hostile duplicate".
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // k=20, w=8 => guarantee threshold k+w-1 = 27 chars
  private val Shared =
    "the quick brown fox jumps over the lazy dog while winnowing selects minima"

  private def profile(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    TextAnalysis.dupSpansOf(
      rows.toDF("doc_id", "source", "text"), k = 20, w = 8)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
  }

  test("q103 catches a shared run at stride-hostile alignments") {
    // offsets 41 vs 37: the copies' window grids disagree mod every
    // stride in 2..10, so any fixed-stride scheme misses this pair
    val prefixA = "A" * 41
    val prefixB = "B" * 37
    val out = profile(Seq(
      (1L, "src_a", prefixA + Shared + "C" * 30),
      (2L, "src_b", prefixB + Shared + "D" * 33),
      (3L, "src_c", "0123456789" * 12))) // control: no shared run
    assert(out("src_a").getAs[Long]("docs_with_dup") == 1L, out("src_a").toString)
    assert(out("src_b").getAs[Long]("docs_with_dup") == 1L, out("src_b").toString)
    assert(out("src_a").getAs[Long]("dup_fps") >= 1L)
    assert(out("src_c").getAs[Long]("dup_fps") == 0L, out("src_c").toString)
    assert(out("src_c").getAs[Long]("docs_with_dup") == 0L)
  }

  test("q103 finds nothing when no run reaches the k+w-1 guarantee") {
    // 20-char shared block sits below the 27-char guarantee AND below the
    // point where a full k-gram window of it exists in both docs
    val small = Shared.take(19)
    val out = profile(Seq(
      (1L, "src_a", "E" * 40 + small + "F" * 40),
      (2L, "src_b", "G" * 40 + small + "H" * 40)))
    assert(out.values.map(_.getAs[Long]("dup_fps")).sum == 0L)
  }

  test("q102 pruning accounting is consistent with the q95 pair relation") {
    val pairs = Similarity.nearDupLsh(spark, dir).collect()
    val expectedPruned = pairs.map(_.getAs[Long]("vec_b")).toSet.size.toLong
    val prof = Similarity.semanticKeepers(spark, dir).collect()
    assert(prof.forall(r =>
      r.getAs[Long]("n_pruned") + r.getAs[Long]("n_kept") == r.getAs[Long]("n_vecs")))
    assert(prof.map(_.getAs[Long]("n_pruned")).sum == expectedPruned,
      "per-label pruned counts must sum to the distinct higher ids of the pair set")
    val corpus = Tables(spark, dir, "embeddings").count()
    assert(prof.map(_.getAs[Long]("n_vecs")).sum == corpus)
  }

  test("q107 catches a planted away-pointing outlier and only it") {
    import spark.implicits._
    // label 0: nine vectors clustered near +e1 (small deterministic jitter
    // on e2), one planted at -e1 — the centroid points at +e1, so exactly
    // the planted vector has negative cosine
    val rows = (0L until 9L).map { i =>
      (i, Array(1.0f, 0.01f * i, 0f, 0f), 0)
    } :+ ((9L, Array(-1.0f, 0f, 0f, 0f), 0))
    val out = Similarity.embeddingOutliersOf(
        rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_vecs") == 10L)
    assert(r.getAs[Long]("n_neg") == 1L, s"expected exactly the planted outlier: $r")
    assert(r.getAs[Double]("min_cos") < -0.9, s"planted outlier should sit near -1: $r")
    assert(r.getAs[Double]("avg_cos") > 0.5)
  }

  test("q104 contamination verdicts agree with q69's membership relation") {
    val q69Docs = TextAnalysis.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val prof = TextAnalysis.contaminationProfile(spark, dir).collect()
    assert(prof.map(_.getAs[Long]("n_contaminated")).sum == q69Docs.size.toLong,
      "per-source contaminated doc counts must sum to q69's verdict set")
    for (r <- prof) {
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_docs"))
      val frac = r.getAs[Double]("gram_hit_frac")
      val maxFrac = r.getAs[Double]("max_doc_frac")
      assert(frac >= 0.0 && frac <= 1.0 && maxFrac >= frac - 1e-9,
        s"profile fractions inconsistent: $r")
    }
  }
}
