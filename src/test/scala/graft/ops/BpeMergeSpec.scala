package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q115 falsifiability: on a corpus whose dominant character pair is
  * planted by construction — including via WORD FREQUENCY, not just
  * within-word multiplicity — the top merge candidate must be that
  * pair with the exact weighted count. */
class BpeMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("top merge is the planted pair; counts are word-frequency weighted") {
    import spark.implicits._
    // "zq" appears once per word, but the word repeats 10 times across
    // docs → count 10; "xy" appears in one word containing it twice → 2
    val docs = Seq(
      (1L, "zqa zqa zqa zqa zqa"),
      (2L, "zqa zqa zqa zqa zqa"),
      (3L, "xyxy other words here")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeFirstMergesOf(docs, topK = 3)
      .as[(String, String, Long, Long)].collect()
    // "zqa" plants BOTH (z,q) and (q,a) at weight 10; tiebreak is
    // (n desc, a, b) so (q,a) ranks first — both must lead at count 10
    val top2 = out.take(2).map(r => (r._1, r._2, r._3)).toSet
    assert(top2 == Set(("z", "q", 10L), ("q", "a", 10L)),
      s"planted pairs must lead at word-frequency weight 10: ${out.toSeq}")
    assert(out.take(2).map(_._4).toSeq == Seq(1L, 2L))
    val xy = out.find(r => r._1 == "x" && r._2 == "y")
    assert(xy.forall(_._3 == 2L), s"(x,y) within-word multiplicity wrong: ${out.toSeq}")
  }

  test("single-char words contribute no pairs") {
    import spark.implicits._
    val docs = Seq((1L, "a b c ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeFirstMergesOf(docs, topK = 10)
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq.map(r => (r._1, r._2, r._3)) == Seq(("a", "b", 1L)),
      s"only the two-char word pairs: ${out.toSeq}")
  }
}
