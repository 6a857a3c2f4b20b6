package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline a pre-training data run
  * executes as one job: quality gate → normalized dedup → benchmark
  * decontamination → per-(lang, source) corpus accounting. Each stage is
  * an operator that also ships standalone (q23 / q31 / q69); this
  * composite proves they fuse into a single declarative plan — Catalyst
  * sees the whole lineage, so scans merge, filters stay pushed, and no
  * stage materializes an intermediate corpus.
  *
  * Scale shape: two corpus shuffles total (the fingerprint group-by and
  * the final aggregate) plus the decontamination join, whose eval side
  * is broadcast. The keeper and contaminated id-sets are joined
  * semi/anti on `doc_id` — never collected to the driver.
  */
object Curation {

  /** The curated training corpus (full doc rows): quality gate →
    * normalized dedup → eval holdout → decontamination — q72's keeper
    * rules BEFORE its accounting aggregate. Shared by [[curate]] and the
    * materializing exporter ([[Export.writeTrainingShards]]), so the
    * shipped shards can never drift from the accounted corpus. */
  private[ops] def keeperDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // 1. quality gate (same score as q23)
    val quality = docs.where(TextAnalysis.qualityScore >= 0.5)
    // 2. normalized dedup: keep the min doc_id per canonical fingerprint
    //    (computed WITHIN the quality-filtered corpus: a high-quality doc
    //    must not be dropped in favor of a filtered-out duplicate)
    val keepIds = quality
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = quality.join(keepIds, Seq("doc_id"), "left_semi")
    // 3. decontamination: the eval docs themselves never train, and any
    //    train doc sharing a 5-gram with them (q69's verdict, computed
    //    over the FULL corpus — contamination doesn't care about quality)
    //    is dropped
    val contaminated = TextAnalysis.decontaminate(spark, dir).select("doc_id")
    deduped
      .where(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val clean = keeperDocs(spark, dir)
    // 4. what's left: the training corpus, accounted per (lang, source)
    clean.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.nTokens(col("text"))).cast("long").as("ws_tokens"),
        min("doc_id").as("first_id"))
      .orderBy("lang", "source")
  }

  /** Per-doc split assignment behind [[clusterSplit]] — exposed inside
    * the package so the leakage spec can join it against the confirmed
    * near-dup pairs and assert ZERO pairs straddle the boundary. */
  private[ops] def clusterSplitAssign(spark: SparkSession, dir: String,
      threshold: Double, trainPct: Int): DataFrame =
    Dedup.clusterLabels(spark, dir, threshold, maxIters = 10)
      .select(col("doc_id"), col("label"),
        when(pmod(col("label") * lit(2654435761L), lit(100)) < trainPct, "train")
          .otherwise("val").as("split"))

  /** q100: leakage-safe train/validation split at near-dup-CLUSTER
    * granularity. A doc-level hash split leaks: a near-duplicate pair
    * lands one copy in train and one in val, and the eval measures
    * memorization instead of generalization. The unit of assignment is
    * therefore the transitive-closure cluster over the confirmed
    * near-dup pairs ([[Dedup.clusterLabels]] — the SAME shared pair
    * stage every dedup-ladder consumer reads): every member of a
    * cluster inherits the cluster label's hash bucket, so no confirmed
    * pair can ever straddle the boundary (pinned by ClusterSplitSpec,
    * which also shows the naive doc-hash split DOES straddle pairs on
    * the gate corpus — the operator is load-bearing, not decorative).
    *
    * Scale shape: clustering is the bounded BSP propagation q59 already
    * measures at 100× (round count bounded by component diameter); the
    * split itself is a pure hash of the label — no extra shuffle beyond
    * one join to attach (source, n_chars) and the final accounting
    * aggregate. Determinism: the same Knuth multiplicative hash bucket
    * as every sampling operator here; exact int64 arithmetic, so the
    * assignment is identical on any engine or partitioning. */
  def clusterSplit(spark: SparkSession, dir: String, threshold: Double = 0.5,
      trainPct: Int = 90): DataFrame =
    clusterSplitAssign(spark, dir, threshold, trainPct)
      .join(Tables.documents(spark, dir).select("doc_id", "source", "n_chars"), Seq("doc_id"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("label").as("n_clusters"),
        sum("n_chars").as("total_chars"))
      .orderBy("split", "source")

  /** q79: delta-shard merge accounting — the upsert a rolling ingest runs
    * when a new crawl shard lands on an existing corpus. Shards are
    * simulated by doc_id (last 2 of every 10 ids = the delta); the merge
    * key is the normalization fingerprint. A delta doc REPLACES base
    * docs sharing its fingerprint, otherwise INSERTS; base fingerprints
    * without a delta hit persist.
    *
    * One fingerprint group-by carrying two conditional flags is the
    * whole merge — the same single-shuffle shape `MERGE INTO` compiles
    * to on key-matched upserts, and it scales as exact dedup does. */
  /** q114: quality-ensemble funnel — per-source accounting of how many
    * docs (and what token share) survive each rung of the stacked
    * quality gates a curation pass actually runs:
    *   rung 1  surface quality (q23's score ≥ 0.5)
    *   rung 2  + unigram-LM NLL ≤ `tUnigram` (q97 — rare-word soup)
    *   rung 3  + bigram-LM NLL ≤ `tBigram`  (q113 — implausible order)
    * The read an operator does before shipping thresholds: which rung
    * costs which source how many tokens (q109's funnel is the dedup
    * twin of this for the dedup ladder).
    *
    * Composite honesty: this IS three corpus passes (quality is a
    * per-row projection; each LM pass is the q97/q113 two-shuffle
    * shape) joined on doc_id — the id-joins are equi-joins and the
    * accounting is one |sources|-row aggregate. Docs with no bigram
    * positions (< 2 tokens) fail rung 3 by definition (COALESCE to +∞
    * in both engines). Thresholds are ABSOLUTE nats-per-token values,
    * not corpus percentiles — percentile gates would make each source's
    * verdict depend on approximate global quantiles (engine-divergent
    * and re-shuffling); the defaults sit in the sf0.01 distribution's
    * discriminative band. */
  def qualityFunnel(spark: SparkSession, dir: String,
      tUnigram: Double = 3.45, tBigram: Double = 3.45): DataFrame = {
    val base = Tables.documents(spark, dir)
      .withColumn("quality", TextAnalysis.qualityScore)
      .select(col("doc_id"), col("source"), col("quality"))
    val uni = TextAnalysis.unigramLogprob(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("nll").as("u_nll"))
    val bi = TextAnalysis.bigramLogprob(spark, dir)
      .select(col("doc_id"), col("nll").as("b_nll"))
    val scored = base
      .join(uni, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (col("quality") >= lit(0.5)).as("g1"),
        (col("quality") >= lit(0.5) &&
          coalesce(col("u_nll"), lit(1e9)) <= lit(tUnigram)).as("g2"),
        (col("quality") >= lit(0.5) &&
          coalesce(col("u_nll"), lit(1e9)) <= lit(tUnigram) &&
          coalesce(col("b_nll"), lit(1e9)) <= lit(tBigram)).as("g3"))
    scored.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("n_pass_quality"),
        sum(when(col("g2"), 1L).otherwise(0L)).as("n_pass_unigram"),
        sum(when(col("g3"), 1L).otherwise(0L)).as("n_pass_bigram"),
        round(sum(when(col("g3"), col("n_tokens")).otherwise(0L)) * lit(1.0) /
          greatest(sum(col("n_tokens")), lit(1L)), 4).as("token_frac"))
      .orderBy("source")
  }

  def deltaMerge(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.documents(spark, dir)
      .select(TextAnalysis.fingerprint(col("text")).as("fp"),
        (col("doc_id") % 10 >= 8).cast("int").as("is_delta"))
    flagged
      .groupBy("fp")
      .agg(max(col("is_delta")).as("has_delta"),
        max(lit(1) - col("is_delta")).as("has_base"))
      .agg(
        sum(when(col("has_base") === 1 && col("has_delta") === 0, 1L).otherwise(0L)).as("n_base_kept"),
        sum(when(col("has_base") === 1 && col("has_delta") === 1, 1L).otherwise(0L)).as("n_replaced"),
        sum(when(col("has_base") === 0 && col("has_delta") === 1, 1L).otherwise(0L)).as("n_inserted"),
        count(lit(1)).as("final_corpus"))
  }
}
