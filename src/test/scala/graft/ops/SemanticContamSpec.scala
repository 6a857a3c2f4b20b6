package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q135's reason to exist, constructed: a PARAPHRASE of an eval item
  * that shares not one token with it — so the word-5-gram rungs
  * (q69/q99) are provably blind — while its embedding sits at cosine
  * ~1 to the eval item's. The lexical blindness is demonstrated on the
  * real gram machinery, the semantic catch on the real signature/band/
  * verify pipeline, and the gate query must surface hits on the actual
  * corpus. */
class SemanticContamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // eval item (id 0: 0 % 97 == 0) and a full paraphrase (id 5) with a
  // DISJOINT vocabulary; id 7 is unrelated filler
  private val evalText = "the quick brown fox jumps over the lazy dog today"
  private val paraText = "a speedy auburn vulpine leaped across one idle canine yesterday"
  private val fillText = "completely unrelated text about spark shuffle partitions and joins"

  test("the paraphrase shares no 5-gram with the eval item (q69 is blind)") {
    import spark.implicits._
    val docs = Seq((0L, evalText), (5L, paraText), (7L, fillText))
      .toDF("doc_id", "text")
    val grams = TextAnalysis.docGrams(docs)
    val ev = grams.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("gram"))
    val hits = grams.where(col("doc_id") % 97 =!= 0)
      .join(ev, Seq("gram")).count()
    assert(hits == 0, "the fixture must share zero 5-grams (it shares zero tokens)")
  }

  test("the same paraphrase is caught by the embedding rung at cosine ~1") {
    import spark.implicits._
    // deterministic unit vectors: eval direction v; the paraphrase is v
    // nudged in one component (cos ~0.9996); filler is a far direction
    def unit(raw: Array[Double]): Array[Double] = {
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val v = Array.tabulate(64)(i => math.sin(i * 1.37) + 1.1)
    val nudged = v.clone(); nudged(3) += 0.2
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val emb = Seq((0L, unit(v)), (5L, unit(nudged)), (7L, unit(far)))
      .toDF("vec_id", "u")
    val sig = Similarity.lshSignaturesOf(emb, bits = 8, nTables = 8)
    val verdict = Similarity.semanticContaminationOf(sig, threshold = 0.85,
      maxBucketPopulation = 1000).collect()
    assert(verdict.map(_.getLong(0)).toSeq == Seq(5L),
      s"exactly the paraphrase must be flagged: ${verdict.mkString(",")}")
    val row = verdict.head
    assert(row.getLong(1) == 1L, "one eval collision")
    assert(row.getDouble(2) >= 0.99, s"cosine must be ~1, got ${row.getDouble(2)}")
  }

  test("both rungs of the eval-side size ladder emit the same verdict") {
    // the %-derived eval split grows with the corpus, so q135 must not
    // FORCE a broadcast of it: past the row budget the join falls back
    // to the shuffle rung. Same relation, either rung — drive the real
    // corpus signature stage through both and compare row for row.
    val dir = "/root/testdata/sf0.001"
    val sig = Similarity.lshSignaturesOf(
      Similarity.unitEmbeddings(spark, dir), bits = 8, nTables = 8)
    val bc = Similarity.semanticContaminationOf(sig, threshold = 0.35,
      maxBucketPopulation = 1000).collect().map(_.toSeq).toSeq
    val sh = Similarity.semanticContaminationOf(sig, threshold = 0.35,
      maxBucketPopulation = 1000, maxBroadcastEvalRows = 0L)
      .collect().map(_.toSeq).toSeq
    assert(bc.nonEmpty, "the ladder fixture must produce hits")
    assert(bc == sh, "the shuffle rung diverged from the broadcast rung")
  }

  test("q135 surfaces eval collisions on the real corpus") {
    val out = Similarity.semanticContamination(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.nonEmpty, "q135 found no semantic contamination at sf0.01")
    assert(out.forall(_.getDouble(2) >= 0.4))
    assert(out.forall(_.getLong(0) % 97 != 0), "eval items must not self-report")
  }
}
