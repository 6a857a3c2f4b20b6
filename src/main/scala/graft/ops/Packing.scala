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
        round(col("sum_tok") / (col("n_packs") * lit(window * 1.0)), 4).as("fill_ratio"))
      .orderBy("source", "bucket")
  }
}
