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
}
