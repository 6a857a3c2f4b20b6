package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The materialized last mile of the curation pipeline: take the q72
  * keeper corpus ([[Curation.keeperDocs]] — quality gate, normalized
  * dedup, eval holdout, decontamination), apply the q101 deterministic
  * export permutation (ONE salt-keyed md5 drives both shard assignment
  * and within-shard order), and WRITE the training shards as
  * shard-partitioned parquet plus a manifest — the artifact a
  * tokenization/training job actually consumes, not just a report about
  * it.
  *
  * Determinism contract: the permutation is a pure function of doc_id,
  * so two exports of the same corpus ship identical shards — per-shard
  * membership, row order, and the position-sensitive order checksum all
  * reproduce (ExportSpec pins a re-export against a first run). The
  * manifest is derived from the SAME keyed relation that is written, so
  * it can never drift from the shipped data.
  *
  * Scale shape: one shuffle on `shard` + a within-shard sort — per-shard
  * rows held ~constant by [[Sampling.shardNibbles]] as the corpus grows,
  * so the sort stays distributed and output file sizes stay bounded; no
  * global order-by, nothing collects to the driver.
  */
object Export {

  /** Write the curated corpus as `outDir/shard=N/` parquet (rows in the
    * deterministic export order) and return the per-shard manifest:
    * (shard, n_docs, n_tokens, total_chars, order_checksum). The
    * manifest is also written to `outDir/_manifest` as parquet. */
  def writeTrainingShards(spark: SparkSession, dir: String, outDir: String,
      nibbles: Int = 0): DataFrame = {
    val clean = Curation.keeperDocs(spark, dir)
    val nib = if (nibbles > 0) nibbles else Sampling.shardNibbles(clean.count())
    val keyed = clean
      .withColumn("h", md5(concat(lit("shuffle|"), col("doc_id").cast("string"))))
      .withColumn("shard", conv(substring(col("h"), 1, nib), 16, 10).cast("long"))
      .withColumn("n_tok", TextAnalysis.nTokens(col("text")))
    keyed
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
      .select("shard", "doc_id", "lang", "source", "n_chars", "n_tok", "text")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id")
    val manifest = keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"),
        sum("n_chars").as("total_chars"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
      .orderBy("shard")
    manifest.write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }

  /** Re-derive the manifest from the SHIPPED shards and diff it against
    * the stored `_manifest` — the receiving side's integrity check
    * before tokenization (did every shard arrive, whole and in order?).
    * Positions are recomputed from the files' physical row order via a
    * per-shard window, so a truncated, reordered, or re-written shard
    * moves its `order_checksum` even when counts still match. Returns
    * one row per discrepancy; an empty result is a clean artifact. */
  def verifyShards(spark: SparkSession, outDir: String): DataFrame = {
    val stored = spark.read.parquet(s"$outDir/_manifest")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("order")
    val recomputed = spark.read.parquet(outDir)
      .select(col("shard"), col("doc_id"), col("n_tok"), col("n_chars"),
        monotonically_increasing_id().as("order"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"),
        sum("n_chars").as("total_chars"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
    stored.as("m").join(recomputed.as("s"), Seq("shard"), "full_outer")
      .where(coalesce(col("m.n_docs") =!= col("s.n_docs"), lit(true)) ||
        coalesce(col("m.n_tokens") =!= col("s.n_tokens"), lit(true)) ||
        coalesce(col("m.total_chars") =!= col("s.total_chars"), lit(true)) ||
        coalesce(col("m.order_checksum") =!= col("s.order_checksum"), lit(true)))
      .select(col("shard"),
        col("m.n_docs").as("manifest_docs"), col("s.n_docs").as("shipped_docs"),
        col("m.order_checksum").as("manifest_checksum"),
        col("s.order_checksum").as("shipped_checksum"))
      .orderBy("shard")
  }
}
