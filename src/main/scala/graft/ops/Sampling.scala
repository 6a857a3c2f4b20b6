package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the subsetting step of a training-data
  * pipeline. Spark's `sample()` is seed-dependent per partitioning and
  * not reproducible cross-engine, so selection here is a pure function of
  * the row key: a Knuth multiplicative hash bucket over doc_id. Exact
  * int64 arithmetic → the same rows are chosen on any engine, any
  * partitioning, any cluster size (and the choice is stable under
  * re-runs — what a lineage-tracked data pipeline needs for
  * reproducibility audits).
  */
object Sampling {

  /** Hash bucket in [0, 100): exact integer arithmetic, no float. */
  private def bucket100 = pmod(col("doc_id") * lit(2654435761L), lit(100))

  /** Stratified sample accounting: per-language keep rates (downsample
    * the dominant language, keep the tail) applied via hash bucket.
    * Output is the per-stratum accounting a pipeline logs: corpus count,
    * sampled count, realized fraction. */
  def stratifiedSample(spark: SparkSession, dir: String,
      headRate: Int = 20, tailRate: Int = 50): DataFrame = {
    val rate = when(col("lang") === "en", lit(headRate)).otherwise(lit(tailRate))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), (bucket100 < rate).as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col("lang"), col("n_docs"), col("n_sampled"),
        round(col("n_sampled") / col("n_docs"), 4).as("frac"))
      .orderBy("lang")
  }

  /** Temperature-based source mixing plan — the "how many epochs of each
    * source under a token budget" table a pre-training run is configured
    * from. Each source's sampling weight is `tokens^alpha` (alpha < 1
    * up-weights small/curated sources relative to their raw size — the
    * multilingual-sampling trick applied to source mixing); `mix_p` is
    * the normalized mixture probability and `epochs` the implied
    * pass-count over each source at `budgetTokens` total.
    *
    * Scale shape: the only corpus-sized work is ONE map-side-combined
    * aggregate (source → doc/token counts, token counting via the byte
    * kernel); the mixing math runs on the #sources-row result with a
    * 1-row broadcast normalizer. Nothing downstream of the first
    * aggregate scales with data size. */
  def sourceMixing(spark: SparkSession, dir: String, alpha: Double = 0.5,
      budgetTokens: Long = 1000000L): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.nTokens(col("text"))).as("n_tokens"))
    val norm = perSource.agg(sum(pow(col("n_tokens"), alpha)).as("total_w"))
    perSource.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(pow(col("n_tokens"), lit(alpha)) / col("total_w"), 6).as("mix_p"),
        round(lit(budgetTokens) * pow(col("n_tokens"), lit(alpha)) / col("total_w")
          / col("n_tokens"), 4).as("epochs"))
      .orderBy("source")
  }
}
