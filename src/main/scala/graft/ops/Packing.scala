package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence-packing economics — the step after q82's chunk accounting:
  * given a fixed context window, how efficiently can the corpus be packed
  * into training sequences under LENGTH-BUCKETED packing (group docs into
  * power-of-two length buckets, fill each sequence with window/bucket
  * same-bucket docs — the standard padding-reduction strategy when
  * cross-doc attention masking is off the table and concat-and-split
  * would bleed documents across sequence boundaries).
  *
  * Scale shape: the whole report is ONE map-side-combined hash aggregate
  * on (source, bucket) — bucket assignment and per-doc pack arithmetic
  * are row-local expressions, the shuffle carries |sources × 8| rows. No
  * window/rank is needed because bucket capacities divide the window
  * exactly (powers of two), so pack counts are closed-form per group —
  * a deliberate design choice over rank-then-assign, which would put a
  * per-bucket global ordering (single-reducer skew) in the hot path.
  *
  * Determinism: buckets come from an explicit comparison ladder, NOT
  * `ceil(log2(n))` — `log(x)/log(2)` formulations can land either side of
  * an integer boundary by one ulp depending on the engine, and one ulp
  * would move a doc a bucket. Ceil-divisions run on small exact integers
  * (floor over an exact double quotient), identical cross-engine.
  */
object Packing {

  /** Per-(source, length-bucket) packing report for a `window`-token
    * context: docs over the window chunk into whole sequences (their
    * bucket is the window itself); everything else pads up to its bucket
    * and packs window/bucket to a sequence. */
  def lengthPacking(spark: SparkSession, dir: String, window: Int = 128): DataFrame = {
    require(Integer.bitCount(window) == 1, "window must be a power of two")
    val nTok = TextAnalysis.nTokens(col("text"))
    val ladder = Iterator.iterate(1L)(_ * 2).takeWhile(_ < window).toSeq
    val bucket = ladder.foldLeft(when(nTok > ladder.last, window.toLong)) {
      (acc, b) => acc.when(nTok <= b, b)
    }
    Tables.documents(spark, dir)
      .select(col("source"), nTok.as("n_tok"), bucket.as("bucket"))
      .groupBy("source", "bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tok"),
        // bucket == window rows: each doc occupies ceil(n_tok/window)
        // whole sequences
        sum(ceil(col("n_tok") / lit(window * 1.0)).cast("long")).as("long_packs"))
      .select(
        col("source"), col("bucket"), col("n_docs"), col("sum_tok"),
        when(col("bucket") === window, col("long_packs"))
          // capacity = window/bucket docs per sequence, last one partial
          .otherwise(ceil(col("n_docs") * col("bucket") / lit(window * 1.0)).cast("long"))
          .as("n_packs"))
      .select(col("source"), col("bucket"), col("n_docs"), col("n_packs"),
        (col("n_packs") * window - col("sum_tok")).as("pad_tokens"),
        // tie-free rounding — integer-ratio decimal ties make round()
        // engine-dependent; see the q82 fill_ratio note in
        // [[TextAnalysis.chunkStats]]
        (floor(col("sum_tok") / (col("n_packs") * lit(window * 1.0)) * 10000d
          + 0.5d) / 10000d).as("fill_ratio"))
      .orderBy("source", "bucket")
  }

  /** The MATERIALIZED doc→sequence assignment behind [[lengthPacking]]'s
    * economics — the relation a packing dataloader actually consumes:
    * every doc gets (shard, pack_seq, slot) within its (source, bucket)
    * group; a training sequence is the `window/bucket` docs sharing
    * (source, bucket, shard, pack_seq), and bucket==window docs (longer
    * than the context) each own their pack (slot 0) and span
    * ceil(n_tok/window) sequences.
    *
    * Scale shape: assignment is sequential BY NATURE (slot i+1 depends on
    * where slot i landed), so a naive global `row_number` per
    * (source, bucket) would funnel each group — potentially billions of
    * rows at corpus scale — through one reducer. Instead docs are
    * SHARDED by `doc_id % shards` and packed independently per
    * (source, bucket, shard): the sort partitions shrink by the shard
    * count (raise `shards` with the corpus; each shard's packing is
    * embarrassingly parallel), and the only cost is that each shard's
    * LAST pack may run partial — at most `shards - 1` extra sequences
    * per (source, bucket), a vanishing fraction of the corpus-scale pack
    * count. Same closed-form capacity arithmetic as the economics
    * report, so the two stay consistent by construction.
    *
    * Determinism: shard/pack/slot all derive from `doc_id` ordering and
    * pure integer division/modulo — no hash functions (engine-specific)
    * and no floating-point arithmetic anywhere in the assignment. */
  def packAssignment(spark: SparkSession, dir: String, window: Int = 128,
      shards: Int = 4): DataFrame = {
    require(Integer.bitCount(window) == 1, "window must be a power of two")
    val nTok = TextAnalysis.nTokens(col("text"))
    val ladder = Iterator.iterate(1L)(_ * 2).takeWhile(_ < window).toSeq
    val bucket = ladder.foldLeft(when(nTok > ladder.last, window.toLong)) {
      (acc, b) => acc.when(nTok <= b, b)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "bucket", "shard").orderBy("doc_id")
    // integer `div`, not a double quotient: capacity is exact by
    // construction (bucket divides the power-of-two window), and keeping
    // the whole pack/slot derivation in integer arithmetic means the
    // cross-engine determinism argument needs no floating-point-exactness
    // clause at any scale (a double route is exact only while
    // rn*bucket < 2^53)
    val capacity = expr(s"${window.toLong} div bucket")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), nTok.as("n_tok"), bucket.as("bucket"))
      // sign-following % (not pmod): matches the oracle's % so a corpus
      // with negative ids would still shard identically cross-engine
      .withColumn("shard", (col("doc_id") % shards.toLong).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("source"), col("bucket"), col("shard"),
        when(col("bucket") === window, col("rn"))
          .otherwise(expr(s"rn div (${window.toLong} div bucket)")).as("pack_seq"),
        when(col("bucket") === window, lit(0L))
          .otherwise(col("rn") % capacity).as("slot"),
        // n_tok keeps the relation self-contained: a dataloader laying
        // out physical offsets needs ceil(n_tok/window) for long docs
        // without re-tokenizing the corpus
        col("n_tok"))
      .orderBy("doc_id")
  }
}
