package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 invariants + the plan shape that makes it a 100 TB operator:
  * query terms broadcast (never a shuffle of the corpus against the
  * query set), and per-query top-k is exact under the salted two-phase
  * split (checked against a direct single-window computation). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val result = Retrieval.bm25TopK(spark, dir).cache()

  test("ranks are 1..k per query with strictly ordered scores on ties-free tiebreak") {
    import spark.implicits._
    val perQuery = result.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (q, n, lo, hi) =>
      assert(lo == 1 && hi == n && n <= 5, s"query $q ranks not dense: n=$n lo=$lo hi=$hi")
    }
    // scores non-increasing with rank inside each query
    val inversions = result.as("a").join(result.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.rank") < col("b.rank") &&
          col("a.score") < col("b.score"))
      .count()
    assert(inversions == 0, s"$inversions score inversions across ranks")
  }

  test("salted two-phase top-k equals the direct single-window top-k") {
    // salts=1 degenerates phase 1 to the global window — the direct path
    val direct = Retrieval.bm25TopK(spark, dir, salts = 1)
    assert(result.except(direct).isEmpty && direct.except(result).isEmpty,
      "salted top-k diverges from direct top-k")
  }

  test("query terms broadcast; no cartesian anywhere in the plan") {
    // distinct parameterization so the cached `result` plan can't be
    // substituted for the shape under inspection
    val p = Retrieval.bm25TopK(spark, dir, topK = 7, salts = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"postings join not broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"), s"cartesian in BM25 plan:\n${p.take(1500)}")
    // exactly one BNLJ is allowed: the 1-row corpus-stats broadcast
    // (count/sum_dl/avgdl) — anything more means a real join degenerated
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1, s"$bnlj nested-loop joins in BM25 plan:\n${p.take(1500)}")
  }

  test("indexed mode equals the pruned default and shares one postings build") {
    val indexed = Retrieval.bm25TopK(spark, dir, indexed = true)
    assert(result.except(indexed).isEmpty && indexed.except(result).isEmpty,
      "indexed and pruned modes diverge")
    val before = Retrieval.postingsBuilds.get()
    Retrieval.bm25TopK(spark, dir,
      queries = Seq(1 -> "table scan", 2 -> "stream merge"), topK = 3,
      indexed = true).count()
    assert(Retrieval.postingsBuilds.get() == before,
      "a second indexed batch rebuilt the postings stage")
  }

  test("every retrieved doc contains at least one query term") {
    import spark.implicits._
    val qt = Retrieval.DefaultQueries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
        explode(split(col("qtext"), " ")).as("term"))
    val docsWithTerm = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("term"))
      .join(qt, "term").select("query_id", "doc_id").distinct()
    val orphans = result.select("query_id", "doc_id")
      .join(docsWithTerm, Seq("query_id", "doc_id"), "left_anti").count()
    assert(orphans == 0, s"$orphans retrieved docs contain no query term")
  }
}
