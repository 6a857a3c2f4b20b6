package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.BloomFunctions

/** Pins for the Bloom-prefiltered decontamination path (q99) and its
  * probe expression. The DuckDB gate proves the final relation; these
  * specs prove the parts the hash can't: the no-false-negative contract
  * the equivalence rests on, the codegen health of the probe, the
  * prefilter actually pruning, and row-for-row equality with the exact
  * broadcast plan (q69).
  */
class BloomDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom probe has no false negatives over its inserted set") {
    import spark.implicits._
    val values = (0 until 2000).map(i => s"gram value $i")
    val bloom = BloomFilter.create(values.size.toLong, 0.01)
    values.foreach(bloom.putString)
    val hits = values.toDF("gram")
      .where(BloomFunctions.mightContain(col("gram"), bloom))
      .count()
    assert(hits == values.size, "a Bloom filter must never drop an inserted value")
  }

  test("bloom probe rejects most non-members at the configured FPP") {
    import spark.implicits._
    val bloom = BloomFilter.create(2000L, 0.01)
    (0 until 2000).foreach(i => bloom.putString(s"gram value $i"))
    val probes = (0 until 10000).map(i => s"absent value $i")
    val fp = probes.toDF("gram")
      .where(BloomFunctions.mightContain(col("gram"), bloom))
      .count()
    // 1% nominal; 3% ceiling leaves slack for hash variance
    assert(fp <= 300, s"$fp false positives out of 10000 — filter is not filtering")
  }

  test("the probe runs inside whole-stage codegen, not as a fallback") {
    val bloom = BloomFilter.create(10L, 0.01)
    bloom.putString("g1")
    // over range, not a local Seq: ConvertToLocalRelation would evaluate
    // a filter on a LocalRelation at optimization time and hide codegen
    val df = spark.range(100)
      .select(concat(lit("g"), col("id")).as("gram"))
      .where(BloomFunctions.mightContain(col("gram"), bloom))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star is the whole-stage-codegen marker in plan strings;
    // a fallback expression would strip it from the Filter line
    assert(plan.contains("*(1) Filter bloom_might_contain"), plan)
    assert(df.count() >= 1) // execute it: generated code must compile
  }

  test("q99 equals q69 row-for-row (prefilter + exact confirm = exact)") {
    val exact = TextAnalysis.decontaminate(spark, dir).collect()
    val bloomed = TextAnalysis.decontaminateBloom(spark, dir).collect()
    assert(exact.nonEmpty, "gate corpus has no contamination — spec is vacuous")
    assert(bloomed.sameElements(exact))
  }

  test("the prefilter prunes the corpus scan before the confirm join") {
    val grams = TextAnalysis.docGrams(Tables.documents(spark, dir))
    val eval_ = grams.where(col("doc_id") % 97 === 0).select("gram").distinct()
    val train = grams.where(col("doc_id") % 97 =!= 0)
    val bloom = eval_.stat.bloomFilter("gram", math.max(eval_.count(), 1L), 0.01)
    val trainN = train.count()
    val survivorN = train
      .where(BloomFunctions.mightContain(col("gram"), bloom)).count()
    assert(survivorN < trainN / 2,
      s"prefilter kept $survivorN of $trainN grams — no pruning happening")
  }
}
