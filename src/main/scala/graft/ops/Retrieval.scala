package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-lexical retrieval over the `documents` table — the BM25 layer a
  * training-data pipeline uses for eval-set mining, hard-negative mining,
  * and contamination triage ("which training docs would this benchmark
  * query retrieve?").
  *
  * Scale design (the 100 TB shape):
  *   - The query set is tiny and the corpus is huge, so queries BROADCAST
  *     and the corpus never shuffles against them: candidate postings are
  *     `tokens ⋈ broadcast(query_terms)` — an equi-join that prunes every
  *     document containing no query term before any aggregation.
  *   - Document frequency is computed from the candidate postings (only
  *     query terms need a df), so the term-statistics shuffle is bounded
  *     by |query vocabulary|, not corpus vocabulary.
  *   - Top-k per query is SALTED TWO-PHASE: local top-k within
  *     (query, salt) partitions, then a final top-k over ≤ salts×k
  *     survivors — no single reducer ever sees a whole query's candidate
  *     list, so a stop-word query cannot funnel the corpus through one
  *     task. The phase-1/phase-2 ordering is total (score desc, doc_id),
  *     so the composition is exactly the global top-k.
  *
  * Cross-engine determinism (DuckDB oracle): every aggregate that crosses
  * an unordered SUM is integer — per-term BM25 weights are computed from
  * integer tf/df/dl with a fixed association order, scaled to 1e6 and
  * summed as LONGS. The only doubles are per-row scalar expressions
  * written identically in both engines (same literals, same association),
  * so they are bit-identical IEEE sequences; `ln` agreement is pinned the
  * same way q65's tf-idf is.
  */
object Retrieval {

  /** Deterministic benchmark query set over the corpus vocabulary. */
  val DefaultQueries: Seq[(Int, String)] = Seq(
    1 -> "spark table scan",
    2 -> "window agg group",
    3 -> "customer query fast",
    4 -> "vector stream merge")

  /** q110: BM25 top-k per query (k1=1.2, b=0.75, Robertson-ish idf with
    * the +1 floor so weights stay positive). Output:
    * (query_id, doc_id, score, rank), rank 1..k per query. */
  def bm25TopK(spark: SparkSession, dir: String,
               queries: Seq[(Int, String)] = DefaultQueries,
               topK: Int = 5, salts: Int = 32): DataFrame = {
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
    // per-doc token arrays; dl = |tokens| (BIGINT both engines)
    val toks = docs.select(
      col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))

    // 1-row corpus stats; avgdl written as sum*1.0/count in BOTH engines
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl") * lit(1.0) / col("n_docs"))

    // distinct (query_id, term) — tiny, broadcast into the postings join
    val queryTerms = queries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
        explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()

    // candidate postings: only (doc, term) pairs where term is a query
    // term survive — the corpus-side prune that makes this broadcastable
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(queryTerms), "term")
      .groupBy(col("query_id"), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // df over candidate postings only (a term may appear in several
    // queries; df is per-term, so count distinct docs per term)
    val dfreq = tf.select(col("term"), col("doc_id")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))

    // per-term BM25 weight in 1e6-scaled micros (LONG): association
    // order mirrors the oracle SQL token for token
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val wMicros = round(idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))) *
      lit(1e6), 0).cast("long")

    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("query_id"), col("doc_id"), wMicros.as("sm"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("sm")).as("sm"))

    // salted two-phase top-k (total order: sm desc, doc_id asc)
    val local = Window.partitionBy(col("query_id"), pmod(hash(col("doc_id")), lit(salts)))
      .orderBy(col("sm").desc, col("doc_id"))
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("sm").desc, col("doc_id"))
    scored
      .withColumn("lr", row_number().over(local)).where(col("lr") <= topK)
      .withColumn("rank", row_number().over(global).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"),
        round(col("sm") / lit(1000000.0), 4).as("score"), col("rank"))
      .orderBy("query_id", "rank")
  }
}
