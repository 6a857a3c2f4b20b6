package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The apply half of the BPE loop ([[TextAnalysis.tokenizeWithMerges]],
  * q128): hand-computed fold behavior, and the QUANTITATIVE train→apply
  * consistency contract against q122's own trained table — after
  * applying merges 1..k−1, the weighted adjacency count of pair k in
  * the tokenized corpus must equal exactly the `n` that training round
  * k recorded, because training counted pairs over precisely that
  * intermediate state. Any drift in fold semantics (overlap handling,
  * merge order, separator discipline) between the two code paths breaks
  * the equality.
  */
class BpeTokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def symbolsOf(docs: Seq[String],
      merges: Seq[(String, String)]): Map[String, Seq[String]] = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    TextAnalysis.tokenizedSymbolsOf(df, merges)
      .select(concat_ws("\u001f", col("syms")).as("s"), col("wc"))
      .as[(String, Long)].collect()
      .map { case (s, _) => s.split('\u001f').toSeq }
      .map(syms => syms.mkString -> syms).toMap
  }

  test("hand-computed folds: chained merges fire in order, greedy is non-overlapping") {
    val m = TextAnalysis.DefaultMerges // t+h, th+e, e+r, a+n, o+n
    val out = symbolsOf(Seq("the other anthem onto"), m)
    // "the": t h e -> th e -> the
    assert(out("the") == Seq("the"))
    // "other": o t h e r -> o th e r -> o the r (e+r can no longer fire:
    // the 'e' was consumed by th+e first — merge ORDER is load-bearing)
    assert(out("other") == Seq("o", "the", "r"))
    // "anthem": a n t h e m -> th -> the -> an: [an, the, m]
    assert(out("anthem") == Seq("an", "the", "m"))
    // "onto": o n t o -> on: [on, t, o]
    assert(out("onto") == Seq("on", "t", "o"))
  }

  test("greedy left fold on a run: aaa with a+a gives [aa, a]") {
    val out = symbolsOf(Seq("aaa aaaa"), Seq("a" -> "a"))
    assert(out("aaa") == Seq("aa", "a"))
    assert(out("aaaa") == Seq("aa", "aa"))
  }

  test("train->apply consistency: round-k counts reproduce under the applied table") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val trained = TextAnalysis.bpeMergesOf(docs, rounds = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(trained.size == 4, "training should run all 4 rounds at sf0.001")
    val table = trained.map { case (_, a, b, _) => (a, b) }
    for (k <- 1 to trained.size) {
      val (_, a, b, n) = trained(k - 1)
      // tokenize with the first k-1 merges, then count weighted (a, b)
      // adjacencies — exactly the aggregate training round k ran
      val counted = TextAnalysis.tokenizedSymbolsOf(docs, table.take(k - 1))
        .select(col("wc"), col("syms"))
        .where(size(col("syms")) >= 2)
        .select(col("wc"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .where(col("p.a") === a && col("p.b") === b)
        .agg(coalesce(sum(col("wc")), lit(0L)))
        .head().getLong(0)
      assert(counted == n,
        s"round $k trained ($a,$b)=$n but the applied state counts $counted")
    }
    // and after applying ALL k merges, pair k is fully consumed: zero
    // (a_k, b_k) adjacencies survive their own pass
    for (k <- 1 to trained.size) {
      val (_, a, b, _) = trained(k - 1)
      val left = TextAnalysis.tokenizedSymbolsOf(docs, table.take(k))
        .where(size(col("syms")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
        .where(col("p.a") === a && col("p.b") === b)
        .count()
      assert(left == 0L, s"merge ($a,$b) left $left adjacencies after its own pass")
    }
  }
}
