package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q117 must be an exact rollup of q105's pair relation — same pair
  * count, same shared-fingerprint mass, no pair double-counted across
  * source cells — and both must serve from one winnow stage build. */
class SourceSpanMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("matrix totals equal the q105 pair relation's totals") {
    val pairs = TextAnalysis.dupSpanPairs(spark, dir)
      .agg(count(lit(1)).as("n"), sum("n_shared_fps").as("fps")).head
    val before = TextAnalysis.winnowBuilds.get()
    val matrix = TextAnalysis.sourceSpanMatrix(spark, dir)
      .agg(sum("n_doc_pairs").as("n"), sum("n_shared_fps").as("fps")).head
    assert(TextAnalysis.winnowBuilds.get() == before,
      "q117 rebuilt the winnow stage instead of sharing it")
    assert(matrix.getLong(0) == pairs.getLong(0),
      s"pair counts diverge: matrix ${matrix.getLong(0)} vs q105 ${pairs.getLong(0)}")
    assert(matrix.getLong(1) == pairs.getLong(1),
      s"shared-fp mass diverges: matrix ${matrix.getLong(1)} vs q105 ${pairs.getLong(1)}")
  }

  test("source pairs are unordered (src_a <= src_b) and unique") {
    val m = TextAnalysis.sourceSpanMatrix(spark, dir)
    assert(m.where(col("src_a") > col("src_b")).count() == 0, "ordered cell leaked")
    assert(m.groupBy("src_a", "src_b").count().where(col("count") > 1).count() == 0,
      "duplicate source cell")
  }
}
