package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting layer a large-scale
  * training-data pipeline runs before dedup and filtering.
  *
  * Everything here is built from codegen'd `functions._` expressions
  * (regexp, higher-order array functions) — no UDFs — so each operator is
  * a single narrow scan→project/agg plan that scales linearly with the
  * corpus and never shuffles except for explicit aggregations.
  *
  * Cross-engine determinism: token/char counting uses explicit regex
  * classes valid in both Java regex and RE2; hashes are md5 (bit-stable
  * everywhere) or integer polynomial arithmetic mod 1e9+7 (exact in
  * int64); ratios are rounded to fixed decimals.
  */
object TextAnalysis {

  // counts surface as long: DuckDB surfaces lengths as BIGINT and the
  // driver compares schemas
  private[ops] def nTokens(c: Column): Column =
    graft.functions.TextFunctions.countTokens(c)

  /** `\S+` token runs — byte-wise single-pass kernel, exactly equivalent
    * to `regexp_extract_all(c, "\\S+", 0)` (contract + fuzz pin:
    * graft.core.TextNorm / TextExpressionsSpec). Shared by every
    * text/dedup operator so tokenization can't drift between them. */
  private[graft] def tokens(c: Column): Column =
    graft.functions.TextFunctions.splitWhitespace(c)

  // BPE-ish pre-tokenizer (letter runs | digit runs | single non-space
  // symbol — the classic byte-pair pre-split shape) lives in
  // TextNorm.countBpeTokensUtf8 as a count-only byte kernel.

  /** Per-document surface statistics. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTokens(col("text")).as("n_tokens"),
        round(graft.functions.TextFunctions.countNonWsChars(col("text")) * lit(1.0) /
          greatest(nTokens(col("text")), lit(1)), 4).as("avg_token_len"),
        round(graft.functions.TextFunctions.countNonAlnumChars(col("text")) * lit(1.0) /
          greatest(length(col("text")), lit(1)), 4).as("punct_ratio"))
      .orderBy("doc_id")

  /** Stopword-profile language ID (n-gram-free heuristic): count
    * language-marker stopwords, take a deterministic argmax, and report
    * the confusion matrix against the labeled `lang` column. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    def hits(words: String): Column =
      graft.functions.TextFunctions.countWords(col("text"), words.split('|').toSeq)
    val scored = Tables.documents(spark, dir)
      .withColumn("n_en", hits("the|and|of|to|in"))
      .withColumn("n_de", hits("der|die|und|das|ist"))
      .withColumn("n_fr", hits("le|la|et|les|est"))
      .withColumn("n_es", hits("el|los|las|una|es"))
    scored
      .withColumn("lang_pred",
        when(col("n_en") === 0 && col("n_de") === 0 && col("n_fr") === 0 && col("n_es") === 0, "unk")
          .when(col("n_en") >= greatest(col("n_de"), col("n_fr"), col("n_es")), "en")
          .when(col("n_de") >= greatest(col("n_fr"), col("n_es")), "de")
          .when(col("n_fr") >= col("n_es"), "fr")
          .otherwise("es"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")
  }

  /** Corpus token accounting per source: whitespace tokens and BPE-ish
    * pre-tokens (map-side combine keeps the shuffle to |sources| rows). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens(col("text"))).cast("long").as("ws_tokens"),
        sum(graft.functions.TextFunctions.countBpeTokens(col("text"))).cast("long").as("bpe_tokens"))
      .orderBy("source")

  /** Heuristic quality score in [0,1] as a reusable column over a
    * `documents`-shaped relation (needs `text` and `n_chars`): length
    * saturation + stopword density + non-alnum penalty — the standard
    * pre-training quality-filter shape. Shared by q23, the q72 curation
    * pipeline, and the streaming curation front-end. */
  /** English stopword set of the quality score's density term. */
  private[graft] val QualityStopwords = Seq("the", "a", "of", "to", "and", "is", "in")

  private[graft] def qualityScore: Column = {
    val stop = graft.functions.TextFunctions.countWords(col("text"), QualityStopwords)
    val lenScore = least(col("n_chars") * lit(1.0) / lit(500.0), lit(1.0))
    val stopScore = least(stop * lit(10.0) / greatest(nTokens(col("text")), lit(1)), lit(1.0))
    val punct = graft.functions.TextFunctions.countNonAlnumChars(col("text")) * lit(1.0) /
      greatest(length(col("text")), lit(1))
    round(lit(0.4) * lenScore + lit(0.4) * stopScore + lit(0.2) * (lit(1.0) - punct), 4)
  }

  /** q23: docs scoring at or above the 0.5 quality threshold. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("quality", qualityScore)
      .where(col("quality") >= 0.5)
      .select("doc_id", "quality")
      .orderBy("doc_id")
  }

  /** Normalization fingerprint: lowercase → strip non-alnum → collapse
    * whitespace → md5. The canonical near-exact-dup key (casing /
    * punctuation / whitespace insensitive). The normalization is the
    * byte-wise `normalize_text` kernel — bit-identical to the original
    * `trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""),
    * "\\s+", " "))` chain (TextExpressionsSpec), which was 16.7 s of
    * pure regex compute at the 100× corpus. */
  def fingerprint(c: Column): Column =
    md5(graft.functions.TextFunctions.normalizeText(c))

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Polynomial rolling hash over the character stream (mod 1e9+7, base
    * 31) via the `aggregate` higher-order function — exact int64
    * arithmetic, no hash-library dependence, reproducible in any engine. */
  def rollingHash(spark: SparkSession, dir: String): DataFrame = {
    val chars = filter(split(col("text"), ""), c => length(c) === 1)
    val rh = aggregate(chars, lit(7L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))
    Tables.documents(spark, dir)
      .select(col("doc_id"), rh.as("roll_hash"))
      .orderBy("doc_id")
  }

  /** Repetition signals (the Gopher/C4 duplicate-n-gram filters): per doc,
    * the fraction of word-bigram occurrences that are repeats and the
    * share of the single most frequent bigram. Two hash aggregates over
    * exploded bigrams; every ratio derives from exact integer counts, so
    * the doubles are bit-identical cross-engine. Docs with fewer than two
    * tokens produce no bigrams and drop out (same on both engines). */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val bigrams = transform(sequence(lit(1), size(col("toks")) - 1),
      i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), count(lit(1)).as("n_distinct"), max("n").as("max_rep"))
      .select(col("doc_id"), col("n_bigrams"),
        round(lit(1.0) - col("n_distinct") / col("n_bigrams"), 4).as("dup_ratio"),
        round(col("max_rep") / col("n_bigrams"), 4).as("top_frac"))
      .orderBy("doc_id")
  }

  /** Character-level Shannon entropy (bits/char) — the gibberish /
    * low-diversity detector. Determinism: per-(doc, char) counts are
    * exact integers; the p·ln p terms are folded in SORTED char order via
    * the sequential `aggregate` HOF (an unordered SUM over doubles varies
    * in the last ulp with partitioning), then one division by ln 2. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = filter(split(col("text"), ""), c => length(c) === 1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(chars).as("ch"))
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_chars"),
        array_sort(collect_list(struct(col("ch"), col("cnt")))).as("dist"))
      .select(col("doc_id"), col("n_chars"),
        round(-aggregate(col("dist"), lit(0.0),
          (acc, s) => acc + (s.getField("cnt") / col("n_chars")) *
            log(s.getField("cnt") / col("n_chars"))) / log(lit(2.0)), 4).as("entropy_bits"))
      .orderBy("doc_id")
  }

  /** TF-IDF top terms per document: tf and df are hash aggregates over
    * the exploded token stream, the corpus size joins in as a broadcast
    * scalar, and the per-doc top-3 ranking windows over each doc's own
    * vocabulary (bounded rows per partition). idf = ln(N/df) rounded
    * before ranking so ties break identically cross-engine. */
  def tfidfTop(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // document frequency DERIVES from tf (one row per (doc, term), so
    // counting tf rows per term IS the distinct-doc count) — the former
    // `words.distinct().groupBy(term)` formulation re-tokenized and
    // re-exploded the whole corpus a second time; this way both branches
    // consume the SAME (doc_id, term) exchange, which the engine reuses
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs") / col("df")), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("term"), round(col("tfidf"), 4).as("tfidf"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** Corpus unigram-LM quality proxy (the CCNet-style language-model
    * filter, reduced to its order-0 core): score every document by the
    * mean negative log-likelihood of its tokens under the corpus's own
    * unigram MLE. Boilerplate-ish documents full of globally frequent
    * tokens score LOW (predictable), lexically unusual documents score
    * HIGH — the scalar a pre-training pipeline thresholds or buckets on
    * before spending GPU time on a real LM.
    *
    * Scale shape: one (doc_id, term) explode feeds BOTH the term-count
    * relation and the per-doc score (the tf exchange is reused, as in
    * [[tfidfTop]]); the LM side is vocabulary-sized, joined back on
    * `term` — a plain shuffle join that never widens beyond tf rows.
    * The grand-total is a 1-row broadcast. No windows, no sorts over the
    * corpus; deliberately NOT a percentile bucketing (head/middle/tail
    * tertiles need a corpus-wide sort — a fixed threshold downstream
    * does not). */
  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val lm = tf.groupBy("term").agg(sum("tf").as("term_count"))
    val total = tf.agg(sum("tf").as("total"))
    // per-(doc, term) NLL contributions cross the unordered per-doc SUM
    // as 1e6-scaled LONGS (q113's discipline): integer addition is
    // associative, so the doc score — and every downstream threshold
    // gate composed on it (q114's rung 2) — is exact under any
    // partitioning instead of drifting in the last ulp with summation
    // order and possibly flipping a rounded boundary doc cross-engine
    tf.join(lm, Seq("term")).crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        round(col("tf") * log(col("total") * lit(1.0) / col("term_count")) * lit(1e6), 0)
          .cast("long").as("t6"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        round(sum(col("t6")) * lit(1.0) / sum("tf") / lit(1e6), 4).as("nll"))
      .orderBy("doc_id")
  }

  /** q113: bigram-LM negative log-likelihood per document — the
    * next-order quality score above q97's unigram NLL (a doc of common
    * words in IMPLAUSIBLE order scores ordinary under a unigram LM but
    * high here; template/boilerplate text with rigid word order scores
    * low). Laplace-smoothed conditional: P(w₂|w₁) = (c(w₁w₂)+1) /
    * (c(w₁·)+V), nll = mean −ln P over the doc's bigram positions; docs
    * with fewer than two tokens have no bigram positions and are
    * excluded (mirrored by the oracle).
    *
    * Scale shape: bigram counts are one hash-aggregate over exploded
    * adjacent pairs (map-side combined); the context counts c(w₁·) are
    * a SECOND aggregation over the (already |distinct bigrams|-sized)
    * c₂ relation, not the corpus; the score is computed once per
    * DISTINCT bigram and joined back to positions in a single (w1, w2)
    * equi-join — so only one join touches corpus-position-sized data.
    * Cross-engine determinism: counts and vocab size are integers, the
    * per-position −ln term is written with identical literals/
    * association in both engines, and the per-doc mean crosses the
    * unordered SUM as 1e6-scaled longs. */
  def bigramLogprob(spark: SparkSession, dir: String): DataFrame =
    bigramLogprobOf(Tables.documents(spark, dir))

  /** The q113 pipeline over any (doc_id, text) relation — split out so
    * the planted-order spec can drive it with constructed word order. */
  private[graft] def bigramLogprobOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val bg = toks
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // corpus positions aggregate once, onto the (w1, w2) vocab key —
    // the narrowest key with full collapse; context counts roll up from
    // it. (A per-(doc, w1, w2) first-stage aggregate — the q97 tf shape
    // — measured 28% SLOWER at 100×: this corpus repeats few bigrams
    // within a doc, so the wider key bought no collapse and cost an
    // extra corpus-sized shuffle.)
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = toks
      .select(explode(col("t")).as("term")).distinct()
      .agg(count(lit(1)).as("v"))
    val score = c2.join(c1, Seq("w1")).crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(-log((col("c2") + lit(1.0)) / (col("c1") + col("v"))) * lit(1e6), 0)
          .cast("long").as("t6"))
    bg.join(score, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("t6")) * lit(1.0) / count(lit(1)) / lit(1e6), 4).as("nll"))
      .orderBy("doc_id")
  }

  /** q115: the first BPE merge round — adjacent character-pair counts
    * over the word vocabulary, weighted by word frequency, top-k merge
    * candidates. The opening move of byte-pair tokenizer training, and
    * the diagnostic for "does this corpus's character bigram structure
    * match the tokenizer we plan to reuse".
    *
    * Scale shape (the classic BPE-training trick): the corpus
    * aggregates ONCE onto the word vocabulary (map-side combined);
    * pair extraction then explodes only distinct words — for a 100 TB
    * corpus the word vocab is millions of rows, not trillions of
    * positions. The top-k ranking window runs over the pair vocabulary,
    * which is bounded by alphabet² — constant-size at any corpus scale,
    * so the single-partition rank is not a reducer funnel. */
  def bpeFirstMerges(spark: SparkSession, dir: String, topK: Int = 20): DataFrame =
    bpeFirstMergesOf(Tables.documents(spark, dir), topK)

  /** The q115 pipeline over any (doc_id, text) relation — split out so
    * the planted-pair spec can drive it with a known dominant merge. */
  private[graft] def bpeFirstMergesOf(docs: DataFrame, topK: Int): DataFrame = {
    val wc = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pairs = wc
      .where(length(col("w")) >= 2)
      .select(col("wc"), explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => struct(col("w").substr(i, lit(1)).as("a"),
          col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("wc"))
    val pc = pairs.groupBy("a", "b").agg(sum(col("wc")).as("n"))
    pc.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("a"), col("b"))).cast("long"))
      .where(col("rank") <= topK)
      .orderBy("rank")
  }

  /** Merge rounds the most recent [[bpeMerges]] run executed in this JVM
    * (−1 before any run) — bench telemetry, the q59 rounds-count
    * discipline: a run that early-stops (vocabulary fully merged) is
    * visible in the artifact, not silent. */
  val lastBpeRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Symbol separator inside a word's BPE state string — U+001F (unit
    * separator), not producible by the whitespace tokenizer's
    * non-whitespace tokens in any corpus this pipeline targets; both
    * engines split on the same char, so even a hostile token containing
    * it degrades identically (parity over elegance). */
  private val BpeSep = "\u001f"

  /** q122: MULTI-round BPE merge training — the actual byte-pair-encoding
    * training loop, extending q115's single-round snapshot to the merge
    * SEQUENCE a tokenizer ships: per round, count adjacent symbol pairs
    * over the word vocabulary (frequency-weighted), take the top pair
    * (total tiebreak: n desc, a, b), merge it greedily left-to-right in
    * every word, repeat. Output: (round, a, b, n) — the merge table,
    * rounds-sized by definition.
    *
    * Scale shape (q115's trick, kept through every round): the corpus
    * aggregates ONCE onto the word vocabulary; every round then works on
    * the vocab-sized state relation — one pair-count shuffle per round
    * plus a 1-row top-1 collect (driver-side control flow only, the q59
    * bounded-loop discipline; [[lastBpeRounds]] records how many rounds
    * actually ran). The merge itself is a per-word left FOLD (`aggregate`
    * HOF): append the next symbol, or — when the tail symbol is `a` and
    * the next is `b` — extend the tail in place. A fold is exactly
    * greedy non-overlapping BPE ("aaa" + merge(a,a) → [aa, a], because
    * the merged tail "aa" no longer equals "a"), and the DuckDB oracle
    * runs the SAME fold via `list_reduce`, so the engines cannot drift
    * on overlap semantics. Early stop when no pairs remain: the oracle's
    * round CTEs go empty past that point too, so both sides emit the
    * same truncated merge table. */
  def bpeMerges(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame =
    bpeMergesOf(Tables.documents(spark, dir), rounds)

  /** The q122 loop over any (doc_id, text) relation — split out so the
    * hand-computed merge-sequence spec can drive a constructed
    * vocabulary. */
  private[graft] def bpeMergesOf(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1 && rounds <= 1000, "rounds is a bounded driver loop")
    val wc0 = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    // round-0 state: the word's characters joined by the separator; the
    // word itself is dropped — only (wc, s) flows through the rounds
    var state = wc0.select(col("wc"),
      concat_ws(BpeSep, transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("s"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 1
    var stop = false
    while (r <= rounds && !stop) {
      val syms = state.select(col("wc"), split(col("s"), BpeSep).as("y"))
      val top = syms
        .where(size(col("y")) >= 2)
        .select(col("wc"), explode(transform(sequence(lit(1), size(col("y")) - 1),
          i => struct(element_at(col("y"), i).as("a"),
            element_at(col("y"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) stop = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, n))
        val next = state.select(col("wc"), mergeFold(col("s"), a, b).as("s"))
          .cache()
        next.count()
        state.unpersist(blocking = false)
        state = next
        r += 1
      }
    }
    lastBpeRounds.set(merges.size)
    state.unpersist(blocking = false)
    merges.toSeq.toDF("round", "a", "b", "n").orderBy("round")
  }

  /** One greedy left-fold merge pass of (a, b) over a BpeSep-joined
    * symbol string — the shared kernel of the training loop
    * ([[bpeMergesOf]], per round) and the tokenizer
    * ([[tokenizedSymbolsOf]], per table entry). The accumulator is a
    * PLAIN STRING: the original formulation re-split
    * the whole accumulator per element to read its tail symbol
    * (`element_at(split(acc), -1)` — O(len²) string work per word per
    * merge), which made the 5-merge q128 chain the slowest query on the
    * 100× board (15.7 s); `substring_index(acc, sep, -1)` reads the
    * tail DIRECTLY from the string accumulator — no per-element array
    * build. (A struct-accumulator variant carrying the tail alongside
    * was measured at 91 s isolated — struct accumulators push the fold
    * off the codegen path; the string accumulator stays on it.)
    * Semantics unchanged: extend the tail in place when it equals `a`
    * and the next symbol is `b`, else append — the same non-overlapping
    * greedy fold the DuckDB oracle's list_reduce runs. */
  private def mergeFold(s: Column, a: String, b: String): Column =
    aggregate(split(s, BpeSep), lit(""),
      (acc, x) => when(acc === "", x)
        .when(substring_index(acc, BpeSep, -1) === lit(a) && x === lit(b),
          concat(acc, x))
        .otherwise(concat(acc, lit(BpeSep), x)))

  /** Fixed merge table for the q128 gate — small, literal, embedded
    * identically in the Spark fold chain and the generated oracle SQL
    * (the hyperplane-weight discipline applied to strings). Includes a
    * CHAINED merge (t+h, then th+e) so the gate proves merge-ORDER
    * semantics, not just independent pair gluing. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "e" -> "r", "a" -> "n", "o" -> "n")

  /** Per-word tokenized symbol state after applying a merge table in
    * order: each merge is one greedy left FOLD over the word's symbols —
    * the EXACT fold [[bpeMergesOf]] trains with (`aggregate` HOF,
    * tail-extend on match), so a table trained by q122 and applied here
    * cannot disagree on overlap semantics. BpeTokenizeSpec pins the
    * train→apply loop quantitatively: after applying merges 1..k−1, the
    * weighted adjacency count of pair k equals the `n` the training
    * round recorded. */
  private[graft] def tokenizedSymbolsOf(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val wc = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val chars = concat_ws(BpeSep, transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1))))
    val folded = merges.foldLeft(chars) { case (s, (a, b)) => mergeFold(s, a, b) }
    wc.select(col("wc"), split(folded, BpeSep).as("syms"))
  }

  /** q128: tokenize the corpus WITH a trained merge table — the apply
    * half of the BPE loop q122 trains (a tokenizer-sizing study needs
    * both: train merges on a sample, apply them corpus-wide, read the
    * resulting symbol distribution). Output: the top-K symbols of the
    * tokenized corpus by frequency (weighted by word count — the same
    * vocab-sized state discipline as training: the corpus aggregates
    * ONCE onto the word vocabulary; the k-merge fold chain then runs
    * over vocab rows inside codegen, and only the symbol histogram
    * shuffles). Gated under the fixed [[DefaultMerges]] table; the
    * trained-table path is exercised by BpeTokenizeSpec against q122's
    * own output. */
  def tokenizeWithMerges(spark: SparkSession, dir: String,
      merges: Seq[(String, String)] = DefaultMerges, topK: Int = 30): DataFrame =
    tokenizedSymbolsOf(Tables.documents(spark, dir), merges)
      .select(col("wc"), explode(col("syms")).as("symbol"))
      .groupBy("symbol").agg(sum(col("wc")).as("n"))
      .orderBy(col("n").desc, col("symbol"))
      .limit(topK)

  /** Benchmark decontamination: flag training documents sharing any word
    * 5-gram with a held-out eval set (here: `doc_id % 97 == 0` stands in
    * for the benchmark corpus). The standard pre-training contamination
    * check (GPT-3 / PaLM style n-gram overlap).
    *
    * Scale shape: eval benchmarks are tiny relative to a 100 TB corpus,
    * so the distinct eval 5-grams are BROADCAST and the scan over
    * training grams never shuffles the corpus — the only shuffle is the
    * per-doc aggregate of matched grams (∝ contaminated grams, not corpus
    * size). Per-doc grams are `array_distinct`-ed before the explode so a
    * doc repeating one contaminated phrase doesn't amplify join output.
    * Docs under 5 tokens yield no grams on either engine. */
  /** Distinct word-5-gram array over a materialized token-array column —
    * the decontamination unit, shared by batch q69, the q72 composite,
    * and the streaming stage so they can never drift apart. */
  private[graft] def grams5(toks: Column): Column = array_distinct(
    transform(sequence(lit(1), size(toks) - 4),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2), element_at(toks, i + 3), element_at(toks, i + 4))))

  /** Exploded (doc_id, gram) rows for all docs with >= 5 tokens. */
  private[graft] def docGrams(df: DataFrame): DataFrame =
    df.select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(grams5(col("toks"))).as("gram"))

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val grams = docGrams(Tables.documents(spark, dir))
    val eval_ = grams.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("gram"))
    val train = grams.where(col("doc_id") % 97 =!= 0)
    train.join(broadcast(eval_), Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct("gram").as("n_shared"),
        countDistinct("eval_id").as("n_eval_hits"))
      .orderBy("doc_id")
  }

  /** Decontamination's LARGE-eval-set scale path: same verdict relation
    * as [[decontaminate]], different plan shape. q69 broadcasts the
    * distinct eval-gram SET — exact, but the broadcast grows with the
    * benchmark suite (tens of millions of grams × tens of bytes is
    * gigabytes to every executor). Here the corpus scan is prefiltered by
    * a Bloom filter over the eval grams (~1.2 bytes/gram at 1% FPP,
    * 30-50× smaller than the set; built by ONE distributed aggregate,
    * probed inside whole-stage codegen —
    * [[graft.functions.BloomMightContain]]), and only the survivors —
    * contaminated grams plus the FPP tail, a vanishing fraction of the
    * corpus — reach the exact confirm join that removes false positives.
    * That join is deliberately NOT hinted broadcast: the premise is an
    * eval relation too big to ship, and the bloom has already shrunk the
    * probe side to near-answer size, so an AQE-planned shuffle join is
    * the honest shape. No false negatives exist by Bloom construction,
    * so the result is value-identical to q69 (same DuckDB oracle;
    * equivalence additionally pinned row-for-row by
    * BloomDecontaminateSpec). */
  def decontaminateBloom(spark: SparkSession, dir: String,
      fpp: Double = 0.01): DataFrame = {
    val grams = docGrams(Tables.documents(spark, dir))
    val eval_ = grams.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("gram"))
    val train = grams.where(col("doc_id") % 97 =!= 0)
    val evalGrams = eval_.select("gram").distinct()
    // sizing pass + build pass, both over the (small) eval side only;
    // bit-OR merges make the filter content order-independent, so the
    // build is deterministic under any partitioning
    val expected = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("gram", expected, fpp)
    train
      .where(graft.functions.BloomFunctions.mightContain(col("gram"), bloom))
      .join(eval_, Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct("gram").as("n_shared"),
        countDistinct("eval_id").as("n_eval_hits"))
      .orderBy("doc_id")
  }

  /** q104: per-source contamination profile — the severity layer on top
    * of q69's membership verdict. q69/q99 answer "WHICH train docs share
    * any 5-gram with the eval split"; a curation decision also needs HOW
    * MUCH of each doc is contaminated and WHERE it concentrates, because
    * the remediation differs (drop a source wholesale vs filter a few
    * docs vs ignore background collision noise). Per train doc:
    * fraction of its distinct 5-grams hitting the eval-gram set; rolled
    * up per source as doc counts, the corpus-weighted gram-hit fraction,
    * and the worst single doc. Same eval-gram broadcast shape as q69
    * (the corpus side never shuffles for the join); per-source rollup is
    * one hash aggregate. Determinism: the fractions divide exact longs
    * (per-doc counts), and max over per-doc ratios is order-free. */
  def contaminationProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val grams = docGrams(docs)
    val evalGrams = grams.where(col("doc_id") % 97 === 0)
      .select(col("gram")).distinct()
      .withColumn("hit", lit(1L))
    val perDoc = grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
    perDoc.join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_contaminated"),
        round(sum("n_hits") * lit(1.0) / sum("n_grams"), 4).as("gram_hit_frac"),
        round(max(col("n_hits") * lit(1.0) / col("n_grams")), 4).as("max_doc_frac"))
      .orderBy("source")
  }

  /** q103: duplicated-span profile — EXACT substring duplication at
    * sub-document granularity via WINNOWED fingerprints. The whole-text
    * rungs (q30/q31) and near-dup rungs (q32+/q34+) miss partial
    * copies — a quoted paragraph, a license block pasted mid-file; this
    * rung catches them (the detection read of Lee et al. 2022,
    * arXiv:2107.06499's "deduplicate exact substrings").
    *
    * Fingerprint selection is winnowing (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003, the MOSS algorithm): hash EVERY `k`-char substring,
    * then per sliding window of `w` consecutive hashes keep the minimum.
    * The point of the min-selection is ALIGNMENT INDEPENDENCE — a naive
    * "every k-th window" stride misses a duplicated paragraph whose
    * copies start at offsets differing by a non-multiple of the stride
    * (the two copies' windows never line up), while winnowing guarantees
    * any shared run of >= k+w-1 chars yields a shared fingerprint at ANY
    * pair of alignments, selecting only ~2/(w+1) of positions for the
    * global index. A doc's fingerprint is duplicated iff some other doc
    * selected it too; rolled up per source as fingerprint totals, the
    * duplicated fraction, and how many docs carry any duplicated span.
    *
    * Scale shape: hashing + min-selection run entirely INSIDE a per-row
    * projection — the codegen'd [[graft.functions.WinnowFingerprints]]
    * kernel (O(n) rolling Karp-Rabin hash + monotonic-deque sliding min;
    * cross-engine arithmetic contract in [[graft.core.Winnow]]) — no
    * corpus-wide shuffle, no per-position explode, no window-function
    * sort; only the winnowed survivors (~2/(w+1) of positions, distinct
    * per doc) are exploded into the two global hash aggregates (count
    * docs per fingerprint, join back, roll up). The expression-HOF
    * formulation (per-position md5 + array_min over slices) measured
    * 241 s at the 100× corpus; the kernel is the classical linear
    * form. */
  /** (doc_id, source, fps) winnowed-fingerprint projection — the shared
    * input relation of the span family (q103 profile, q105 pairs, the
    * streaming reference index). */
  private[graft] def winnowRel(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.where(length(col("text")) >= k + w - 1)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.winnowFingerprints(col("text"), k, w).as("fps"))

  /** Session-scoped winnowed-fingerprint stage: q103 and q105 each
    * consume the relation twice (totals/eligibility + join-back), so an
    * uncached plan re-scans the text column and re-runs the kernel four
    * times per bench pass. The cached stage is the UNEXPLODED array form
    * (|docs| rows of ~2·m/(w+1) longs — bounded, unlike the exploded
    * 30M-row relation at 100×), the [[StageCache]] discipline. */
  private val winnowCache = new StageCache[(SparkSession, String, Int, Int)]

  /** Visible for specs: number of times the winnow stage was built. */
  private[ops] def winnowBuilds = winnowCache.builds

  private def winnowStage(spark: SparkSession, dir: String,
      k: Int, w: Int): DataFrame =
    winnowCache.getOrBuild((spark, dir, k, w)) {
      val built = winnowRel(Tables.documents(spark, dir), k, w).cache()
      built.count()
      built
    }

  /** Drop this session's resident text stages (winnowed fingerprints) —
    * see [[StageCache.release]]. Next use rebuilds. */
  def releaseStages(spark: SparkSession): Int =
    winnowCache.release(_._1 eq spark)

  def dupSpans(spark: SparkSession, dir: String, k: Int = 20,
      w: Int = 8): DataFrame =
    dupSpansOfRel(winnowStage(spark, dir, k, w))

  /** The q103 pipeline over any (doc_id, source, text) relation — split
    * out so the planted-span spec can drive it with known duplication
    * (including copies at stride-hostile alignments). */
  private[graft] def dupSpansOf(docs: DataFrame, k: Int, w: Int): DataFrame =
    dupSpansOfRel(winnowRel(docs, k, w))

  private def dupSpansOfRel(rel: DataFrame): DataFrame = {
    // per-source totals straight off the kernel's array length — no
    // explode, no shuffle beyond the 20-group source aggregate
    val totals = rel
      .select(col("source"), size(col("fps")).cast("long").as("n_fps"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_fps").as("total_fps"))
    val sel = rel.select(col("doc_id"), col("source"), explode(col("fps")).as("fp"))
    // the kernel emits DISTINCT fps per doc, so plain count(*) per fp IS
    // the doc count — a countDistinct here re-proves that invariant with
    // an Expand + double aggregation that measured 12 s of the 100× cost
    val dupFps = sel.groupBy("fp").agg(count(lit(1)).as("n_span_docs"))
      .where(col("n_span_docs") >= 2)
      .select("fp")
    // only confirmed-duplicate fingerprints flow into the join-back (a
    // vanishing fraction of the 30M-row fingerprint relation at 100×)
    val dupPerDoc = sel.join(dupFps, Seq("fp"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_dup"))
    val dupBySource = dupPerDoc.groupBy("source")
      .agg(count(lit(1)).as("docs_with_dup"), sum("n_dup").as("dup_fps"))
    totals.join(dupBySource, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("docs_with_dup"), lit(0L)).as("docs_with_dup"),
        col("total_fps"),
        coalesce(col("dup_fps"), lit(0L)).as("dup_fps"),
        round(coalesce(col("dup_fps"), lit(0L)) * lit(1.0) / col("total_fps"), 4)
          .as("dup_fp_frac"))
      .orderBy("source")
  }

  /** q105: duplicated-span PAIR relation — WHICH document pairs share
    * exact spans, and how many winnowed fingerprints they share. q103
    * answers "how much sub-document duplication does each source carry";
    * this is its remediation read (Lee et al. 2107.06499: the pair list
    * drives which copy of a duplicated passage gets cut), and it catches
    * the asymmetric-containment case the whole-doc rungs miss by
    * construction: a short doc quoted inside a long one has near-zero
    * shingle Jaccard (q32/q33 blind) and distant cosine (q95 blind) but
    * shares every fingerprint of the quoted run.
    *
    * Shape: the same winnowed fingerprint relation as q103; fingerprints
    * are ELIGIBLE when shared by 2..maxFpPopulation docs (the upper
    * bound is the capBands discipline — a boilerplate fingerprint shared
    * by 10k docs would contribute ~10^8 pairs; capped fps still count in
    * q103's profile, they just don't enumerate pairs); eligible
    * fingerprints self-join on the fp key (equi-join, never all-pairs)
    * and pairs aggregate to a shared-fingerprint count. The cap never
    * binds at gate scale, so the static oracle omits it (the q32/q95
    * precedent). */
  def dupSpanPairs(spark: SparkSession, dir: String, k: Int = 20,
      w: Int = 8, maxFpPopulation: Int = 100): DataFrame = {
    val sel = winnowStage(spark, dir, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
    val eligible = sel.groupBy("fp").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2 && col("n") <= maxFpPopulation)
      .select("fp")
    val e = sel.join(eligible, Seq("fp"))
    e.as("a").join(e.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("doc_a", "doc_b")
  }

  /** q117: cross-SOURCE span matrix — which sources re-serve each
    * other's passages, rolled up from the q105 pair relation: per
    * unordered source pair, how many doc pairs share exact winnowed
    * spans and how many fingerprints they share in total. q88 answers
    * this at whole-doc granularity (MinHash near-dups); this is the
    * sub-document version — the read that catches a source
    * wholesale-quoting another's content without ever producing
    * near-duplicate documents (syndication, mirror-with-banner,
    * scraped-quote aggregators).
    *
    * Shape: identical to q105 up to the pair aggregate (shared session
    * winnow stage, eligibility window 2..maxFpPopulation, fp equi-join),
    * then one |sources|²-bounded rollup. Zero marginal corpus work. */
  def sourceSpanMatrix(spark: SparkSession, dir: String, k: Int = 20,
      w: Int = 8, maxFpPopulation: Int = 100): DataFrame = {
    val sel = winnowStage(spark, dir, k, w)
      .select(col("doc_id"), col("source"), explode(col("fps")).as("fp"))
    val eligible = sel.groupBy("fp").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2 && col("n") <= maxFpPopulation)
      .select("fp")
    val e = sel.join(eligible, Seq("fp"))
    val sless = col("a.source") <= col("b.source")
    e.as("a").join(e.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        when(sless, col("a.source")).otherwise(col("b.source")).as("src_a"),
        when(sless, col("b.source")).otherwise(col("a.source")).as("src_b"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_doc_pairs"), sum(col("n_shared")).as("n_shared_fps"))
      .orderBy("src_a", "src_b")
  }

  /** q106: vocabulary frequency-of-frequency (Zipf) profile — term
    * counts bucketed by power of two (`bucket = floor(log2(count)) + 1`,
    * computed as `length(bin(count))` so both engines bucket by INTEGER
    * bit-length, never by floating log2 at a power-of-two edge). The
    * read behind tokenizer/vocab sizing: how heavy is the head, how long
    * is the hapax tail, where does coverage saturate. Scale shape: one
    * token explode → one map-side-combined term aggregate (the shuffle
    * carries distinct terms, not occurrences) → a ~20-row bucket
    * aggregate. */
  def vocabZipf(spark: SparkSession, dir: String): DataFrame = {
    val tc = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    tc.groupBy(length(bin(col("cnt"))).cast("long").as("freq_bucket"))
      .agg(count(lit(1)).as("n_terms"), sum("cnt").as("n_occurrences"),
        min("cnt").as("min_count"), max("cnt").as("max_count"))
      .orderBy("freq_bucket")
  }

  /** q90: template/boilerplate prefix clusters — groups of documents
    * opening with the same first `k` tokens (crawl boilerplate, license
    * headers, scraped templates open identically long before the bodies
    * diverge, so whole-text fingerprints miss them). One hash aggregate
    * on the prefix; clusters of 2+ surface with their size and an
    * example doc. */
  def templatePrefixes(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= k)
      .select(col("doc_id"), concat_ws(" ", slice(col("toks"), 1, k)).as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("example_id"))
      .where(col("n_docs") >= 2)
      .orderBy("prefix")
  }

  /** Corpus-wide top-k bigrams — vocabulary/phrase statistics over the
    * whole corpus. The groupBy on the exploded bigram stream IS the
    * workload: map-side partial aggregation collapses each partition's
    * counts before the shuffle (distinct bigrams move, not occurrences),
    * and the top-k plans as TakeOrderedAndProject — per-partition heaps
    * merged on the driver, k rows, never a global sort. Tie-break on the
    * bigram string makes the k-set deterministic cross-engine. */
  def topNgrams(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val bigrams = transform(sequence(lit(1), size(col("toks")) - 1),
      i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + 1)))
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(explode(bigrams).as("bg"))
      .groupBy("bg")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bg"))
      .limit(k)
  }

  /** Context-window chunk accounting: how many fixed-size training
    * sequences the corpus yields and how much padding it wastes — the
    * economics read that sizes a packing strategy before any GPU time is
    * spent. Per doc: ceil(tokens/chunk) chunks, last chunk padded. One
    * map-side-combined aggregate; all integer arithmetic. */
  def chunkStats(spark: SparkSession, dir: String, chunkTokens: Int = 128): DataFrame = {
    val nTok = nTokens(col("text"))
    val nChunks = ceil(nTok / lit(chunkTokens.toDouble)).cast("long")
    Tables.documents(spark, dir)
      .select(col("source"), nTok.as("n_tok"), nChunks.as("n_chunks"))
      .groupBy("source")
      .agg(
        sum("n_chunks").as("n_chunks"),
        sum(col("n_chunks") * chunkTokens - col("n_tok")).as("pad_tokens"),
        // floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): an integer-over-
        // integer ratio like sum_tok/(chunks*128) lands on exact
        // decimal ties (…5 at the 5th place), where Spark's HALF_UP
        // over the shortest-decimal repr and DuckDB's binary-double
        // rounding disagree by one ulp of the 4th decimal (measured:
        // sf0.001 fill_ratio 0.3788 vs 0.3787). The floor form is the
        // SAME IEEE multiply/add/floor/divide on both engines, so it
        // cannot diverge.
        (floor(sum("n_tok") / (sum("n_chunks") * lit(chunkTokens.toDouble)) * 10000d
          + 0.5d) / 10000d).as("fill_ratio"))
      .orderBy("source")
  }

  // PII patterns. The digit classes cannot match each other (SSN 3-2-4
  // vs phone 3-3-4 groups; IPv4 needs four dotted runs), but an EMAIL
  // can contain SSN/phone/IP-shaped substrings ("123-45-6789@x.co"), so
  // counts are taken on the PROGRESSIVELY-REDACTED text, in redaction
  // order — each count describes exactly what its redaction step
  // replaced.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private[graft] val PiiClasses: Seq[(String, String, String)] = Seq(
    ("n_emails", EmailRe, "<EMAIL>"), ("n_ssns", SsnRe, "<SSN>"),
    ("n_phones", PhoneRe, "<PHONE>"), ("n_ips", IpRe, "<IP>"))

  /** The fully redacted text as a reusable column — shared by q70 and the
    * streaming curation front-end. */
  private[graft] def redacted(text: Column): Column =
    PiiClasses.foldLeft(text) { case (t, (_, re, tag)) => regexp_replace(t, re, tag) }

  /** Per-class PII match count. */
  private[graft] def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** PII scrubbing — the pre-training compliance pass: per-class match
    * counts plus the redacted text with each match replaced by its class
    * tag. Each class is counted on the text with the PREVIOUS classes
    * already redacted, so the counts sum to exactly the tags present in
    * `redacted` even when classes overlap textually (an SSN-shaped email
    * local part counts once, as the email it is). Pure regexp
    * projections (codegen'd, no UDF), one narrow scan at corpus scale. */
  def piiRedact(df: DataFrame, id: String = "id", text: String = "text"): DataFrame = {
    val (counts, _) = PiiClasses.foldLeft((Seq.empty[Column], col(text))) {
      case ((cs, t), (name, re, tag)) =>
        (cs :+ piiCount(t, re).as(name), regexp_replace(t, re, tag))
    }
    df.select(col(id) +: counts :+ redacted(col(text)).as("redacted"): _*)
      .orderBy(id)
  }

  /** Materialized once per JVM, like ConvertQueries' fixture paths. */
  private lazy val piiFixturePath: String =
    ConvertQueries.materialize("/graft/pii_fixture.jsonl", ".jsonl")

  /** q70 driver query: [[piiRedact]] over the committed PII fixture (the
    * testdata documents are synthetic word-soup with no PII, so the
    * fixture pins real pattern semantics; the operator itself is
    * table-generic). Literal-relation oracle, as for q61/q68. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType)))
    piiRedact(spark.read.schema(schema).json(piiFixturePath))
  }
}
