package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q113 falsifiability: the bigram NLL must be ORDER-sensitive — a doc
  * cycling one rigid word pair scores lower (more predictable) than a
  * doc of the same length whose adjacent pairs never repeat, which a
  * unigram LM cannot distinguish when token frequencies match. */
class BigramLogprobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rigid word order scores lower NLL than never-repeating order") {
    import spark.implicits._
    val template = Seq.fill(20)("alpha beta").mkString(" ")         // 40 tokens, 2 types
    val scrambled = (1 to 40).map(i => s"tok$i").mkString(" ")      // 40 tokens, 40 types
    val docs = Seq((100L, template), (200L, scrambled)).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprobOf(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(100L, 200L))
    assert(out(100L)._1 == 39 && out(200L)._1 == 39, s"bigram counts wrong: $out")
    assert(out(100L)._2 < out(200L)._2,
      s"rigid order did not score lower: ${out(100L)._2} vs ${out(200L)._2}")
    assert(out.values.forall(_._2 > 0), s"NLL must be positive: $out")
  }

  test("single-token docs are excluded, not scored") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, "two tokens")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprobOf(docs)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(2L), s"doc 1 has no bigram positions: ${out.toSeq}")
  }
}
