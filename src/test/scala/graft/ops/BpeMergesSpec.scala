package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The q122 multi-round BPE contract ([[TextAnalysis.bpeMerges]]),
  * pinned against a HAND-COMPUTED merge sequence on a constructed
  * vocabulary — the loop's three load-bearing behaviors:
  *
  *  1. the per-round top pair under the total (n desc, a, b) tiebreak,
  *  2. the greedy left-to-right non-overlapping merge (the fold whose
  *     overlap semantics the oracle's list_reduce mirrors),
  *  3. early stop + rounds telemetry when the vocabulary is exhausted.
  */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def merges(docs: Seq[String], rounds: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    TextAnalysis.bpeMergesOf(
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      rounds)
      .as[(Long, String, String, Long)].collect().toSeq
  }

  test("a hand-computed 3-round merge sequence on a constructed vocabulary") {
    // vocab: ababc x3, abd x2, cc x1
    // round 1 pairs: (a,b)=2*3+1*2=8, (b,a)=3, (b,c)=3, (b,d)=2, (c,c)=1
    //   -> merge (a, b, 8); words become [ab ab c], [ab d], [c c]
    // round 2: (ab,ab)=3, (ab,c)=3 tie -> b tiebreak: 'ab' < 'c';
    //   (ab,d)=2, (c,c)=1 -> merge (ab, ab, 3); [abab c], [ab d], [c c]
    // round 3: (abab,c)=3, (ab,d)=2, (c,c)=1 -> merge (abab, c, 3)
    val out = merges(Seq("ababc ababc ababc", "abd abd", "cc"), rounds = 3)
    assert(out == Seq(
      (1L, "a", "b", 8L),
      (2L, "ab", "ab", 3L),
      (3L, "abab", "c", 3L)), s"got $out")
    assert(TextAnalysis.lastBpeRounds.get() == 3)
  }

  test("merges apply greedily left-to-right, non-overlapping") {
    // 'aaa': round 1 pairs (a,a)=2 -> merge; greedy gives [aa, a], NOT
    // [a, aa] and NOT a double-count of the overlapping middle pair.
    // round 2: (aa,a)=1 -> merge -> [aaa]. round 3: no pairs -> stop.
    val out = merges(Seq("aaa"), rounds = 5)
    assert(out == Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)), s"got $out")
    // early stop is visible in the telemetry, not silent
    assert(TextAnalysis.lastBpeRounds.get() == 2)
  }

  test("round 1 equals q115's top merge candidate") {
    import spark.implicits._
    val docs = Seq((0L, "the cat then that"), (1L, "other the there"))
      .toDF("doc_id", "text")
    val q115Top = TextAnalysis.bpeFirstMergesOf(docs, topK = 1)
      .select("a", "b", "n").as[(String, String, Long)].collect().head
    val q122Round1 = TextAnalysis.bpeMergesOf(docs, rounds = 1)
      .select("a", "b", "n").as[(String, String, Long)].collect().head
    assert(q122Round1 == q115Top)
  }
}
