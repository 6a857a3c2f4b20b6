package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q119 falsifiability: when an eval doc's passage verbatim-leaks into
  * a training doc, that doc must rank first for the eval query AND
  * carry a positive shared-5-gram count; the eval doc itself must
  * never appear in its own ranking. */
class ContaminationRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a planted verbatim leak ranks first with a positive gram count") {
    import spark.implicits._
    val evalText = "quantum flux capacitor resonance chamber overload threshold exceeded"
    val filler = (1 to 30).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, evalText),                                  // eval doc (0 % 97 == 0)
      (1L, s"$evalText $filler"),                      // the leak
      (2L, filler),
      (3L, "resonance " + (31 to 60).map(i => s"w$i").mkString(" "))) // one shared term
      .toDF("doc_id", "text")
    val out = Retrieval.contaminationRetrievalOf(docs,
        prefixTokens = 8, topK = 3, salts = 4)
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(!out.exists(r => r._2 == r._1), "eval doc retrieved for its own query")
    val top = out.find(_._4 == 1L).get
    assert(top._2 == 1L, s"the leaked doc must rank first: ${out.toSeq}")
    // evalText has 8 tokens -> 4 distinct 5-grams, all present in doc 1
    assert(top._5 == 4L, s"leak must share all 4 eval 5-grams: ${out.toSeq}")
    // non-leaking hits carry zero shared grams
    assert(out.filter(_._2 != 1L).forall(_._5 == 0L), s"phantom gram counts: ${out.toSeq}")
  }
}
