package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gate: the referential/shape audit a pipeline runs before
  * (and after) every corpus-mutating stage. One named counter per
  * invariant, zero expected on healthy data — non-zero rows are the
  * alert.
  *
  * Scale shape: all document-level checks fold into ONE aggregate pass
  * over the corpus (sums of conditionals — map-side combined to a single
  * row), likewise embedding-level checks; the two referential checks
  * share one full-outer key join whose both sides are just the key
  * columns (pruned scans). Three scans, three single-row aggregates, no
  * driver-side logic. */
object Audit {

  def integrity(spark: SparkSession, dir: String): DataFrame = {
    def cnt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val d = Tables.documents(spark, dir).agg(
      cnt(col("text").isNull || length(col("text")) === 0).as("null_or_empty_text"),
      (count(lit(1)) - countDistinct("doc_id")).as("dup_doc_id"),
      cnt(col("n_chars") =!= length(col("text"))).as("n_chars_mismatch"))
    val e = Tables(spark, dir, "embeddings").agg(
      cnt(col("embedding").isNull).as("null_embedding"),
      cnt(col("embedding").isNotNull && size(col("embedding")) =!= 64).as("bad_embedding_dim"))
    val j = Tables.documents(spark, dir).select("doc_id")
      .join(Tables(spark, dir, "embeddings").select("vec_id"),
        col("doc_id") === col("vec_id"), "full_outer")
      .agg(
        cnt(col("vec_id").isNull).as("doc_missing_embedding"),
        cnt(col("doc_id").isNull).as("orphan_embedding"))
    val wide = d.crossJoin(e).crossJoin(j) // three 1-row frames
    val checks = Seq("null_or_empty_text", "dup_doc_id", "n_chars_mismatch",
      "null_embedding", "bad_embedding_dim", "doc_missing_embedding", "orphan_embedding")
    wide
      .select(explode(map(checks.flatMap(c => Seq(lit(c), col(c))): _*)))
      .toDF("check_name", "n_bad")
      .orderBy("check_name")
  }
}
