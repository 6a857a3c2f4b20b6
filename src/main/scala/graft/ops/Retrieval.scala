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

  private val postingsCache = new StageCache[(SparkSession, String)]
  private val gramsCache = new StageCache[(SparkSession, String)]
  private val dlCache = new StageCache[(SparkSession, String)]
  private[ops] def postingsBuilds = postingsCache.builds
  def releaseStages(spark: SparkSession): Int =
    // The persisted-index artifact shares the session stages' lifecycle
    // ([[TempArtifacts]]): releasing a session also retires its on-disk
    // index, or a corpus regenerated under the same dir would be served
    // stale answers by q127 while q110/q124 rebuild from the new data.
    persistedIndex.release(spark) +
      postingsCache.release(_._1 eq spark) + gramsCache.release(_._1 eq spark) +
      dlCache.release(_._1 eq spark)

  /** Session postings stage — the inverted-index artifact every BM25
    * call serves from: (doc_id, term, tf, dl), one tokenize→aggregate
    * pass per (session, dir), cached and materialized (the StageCache
    * discipline: consumers must plan against real row counts). The
    * corpus is scanned once per session no matter how many query
    * batches run — exactly how a production retrieval layer treats its
    * index build. Corpus stats (n_docs, Σdl) ride along as a grouping-
    * sets-free trick: the dl of each doc repeats on its postings, so
    * stats are an aggregate over `postings.dropDuplicates(doc_id)` —
    * but docs with ZERO tokens would vanish from postings, so dl rows
    * are emitted even for empty docs via a left join from documents. */
  private def postingsStage(spark: SparkSession, dir: String): DataFrame =
    postingsCache.getOrBuild((spark, dir)) {
      val built = postingsOf(Tables.documents(spark, dir)).cache()
      built.count()
      built
    }

  /** The postings build over ANY (doc_id, text) relation — factored out
    * of the session stage so the incremental path ([[appendPostingsDelta]])
    * can run it on a delta batch alone: the artifact rows are PER-DOC
    * (tf is within-doc, dl is per-doc), so base ∪ delta is row-identical
    * to a full rebuild by construction. */
  private def postingsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // left join keeps token-less docs visible to the stats consumer
    // (null term, tf 0) without perturbing term joins (null ≠ any term)
    dl.join(tf, Seq("doc_id"), "left")
      .select(col("doc_id"), col("term"), coalesce(col("tf"), lit(0L)).as("tf"), col("dl"))
  }

  /** q110: BM25 top-k per query (k1=1.2, b=0.75, Robertson-ish idf with
    * the +1 floor so weights stay positive). Output:
    * (query_id, doc_id, score, rank), rank 1..k per query.
    *
    * Two serving modes with a measured tradeoff (100× corpus,
    * local[32]): the default computes tf ONLY for query-term postings —
    * the broadcast prune runs before any aggregation, ~3.7 s single-
    * shot; `indexed = true` serves from the session [[postingsStage]]
    * (full-vocabulary inverted index, built once per (session, dir):
    * ~10.7 s cold, then every batch ~3.8 s with zero corpus work) — the
    * right mode when a retrieval service answers many query batches per
    * session. Both modes produce identical results (RetrievalSpec). */
  def bm25TopK(spark: SparkSession, dir: String,
               queries: Seq[(Int, String)] = DefaultQueries,
               topK: Int = 5, salts: Int = 32,
               indexed: Boolean = false): DataFrame = {
    import spark.implicits._
    val queryTerms = queries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
        explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    bm25Rank(Tables.documents(spark, dir),
      if (indexed) Some(indexStages(spark, dir)) else None,
      queryTerms, topK, salts, excludeSelf = false)
  }

  /** BM25 ranking for an arbitrary (query_id, term) relation — the
    * shared engine of [[bm25TopK]] (literal queries) and
    * [[contaminationRetrieval]] (queries derived from eval docs).
    * `excludeSelf` drops the doc whose id equals the query_id before
    * ranking (for corpus-derived queries, the source doc is a
    * degenerate guaranteed top hit). */
  /** Session doc-length stage for indexed serving — (doc_id, dl), one
    * dropDuplicates over the postings relation, cached: the per-doc
    * relation is |corpus| SHORT rows, while re-deriving it inside every
    * ranking call re-shuffles the full postings relation (measured: the
    * dominant per-page cost of the 100× sweep — 3 pages paid 3 corpus-
    * postings shuffles for a relation that never changes). */
  private def dlStage(spark: SparkSession, dir: String): DataFrame =
    dlCache.getOrBuild((spark, dir)) {
      val built = postingsStage(spark, dir)
        .select(col("doc_id"), col("dl")).dropDuplicates("doc_id").cache()
      built.count()
      built
    }

  /** Indexed-serving artifacts: (postings, per-doc lengths), both
    * session-cached. */
  private def indexStages(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (postingsStage(spark, dir), dlStage(spark, dir))

  /** Persist the BM25 index (postings + doc lengths) as parquet — the
    * lifecycle step the session-cached [[postingsStage]] lacks: a
    * serving restart re-paid the full corpus tokenize/aggregate build
    * (9.1 s at the 100× corpus), and at real scale the index must
    * outlive any one session anyway. Mirrors
    * [[Similarity.saveIvfIndex]]'s layout argument: postings are
    * partitioned by a hash bucket of the term, so a query batch prunes
    * to ≤ |query terms| buckets AT SCAN TIME — the storage-level analog
    * of the broadcast term prune ("probe cost ∝ query vocabulary, not
    * corpus vocabulary"). Token-less docs (null term rows in the
    * session stage) are carried in the dl relation only — the postings
    * artifact stays null-free so bucket pruning never needs a null
    * bucket. */
  def savePostingsIndex(spark: SparkSession, dir: String, outDir: String,
      termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, "bucket count must be positive")
    postingsStage(spark, dir)
      .where(col("term").isNotNull)
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$outDir/postings")
    writeDl(dlStage(spark, dir), s"$outDir/dl", "overwrite")
  }

  /** Partition count of the per-doc dl store (`id_bucket =
    * pmod(xxhash64(doc_id), B)`): the delta append's replay guard and
    * the expunge's rewrite prune to the id buckets their id-set hashes
    * to — guard/delete cost ∝ the delta, never the corpus. A pre-layout
    * artifact (no `id_bucket` partition column) is detected from the
    * store's schema and guarded/expunged in the legacy full-store
    * forms; the next base rebuild re-lays it out. */
  val DefaultIdBuckets = 64

  private def writeDl(dl: DataFrame, path: String, mode: String): Unit =
    dl.withColumn("id_bucket",
        pmod(xxhash64(col("doc_id")), lit(DefaultIdBuckets.toLong)))
      .repartition(col("id_bucket")) // one file per bucket dir, not one per task
      .write.mode(mode).partitionBy("id_bucket").parquet(path)

  /** The dl store in its public (doc_id, dl) shape — readers go through
    * this so the physical `id_bucket` partition column (absent on
    * pre-layout artifacts — drop is a no-op then) never leaks into
    * served relations or corpus stats. */
  private def dlStore(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/dl").drop("id_bucket")

  /** The replay guard's DELTA-PROPORTIONAL dl scan (the
    * [[LshIndex.guardHeldIds]] twin for the postings family): the
    * delta's id-bucket vocabulary (collected locally, ≤ idBuckets
    * longs) pushes a static partition filter into the guard scan —
    * guard cost ∝ the delta, never the corpus. */
  private[graft] def guardHeldIds(spark: SparkSession, indexDir: String,
      delta: DataFrame, idBuckets: Int): DataFrame = {
    val deltaBuckets = delta
      .select(pmod(xxhash64(col("doc_id")), lit(idBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // local: <= idBuckets values
    spark.read.parquet(s"$indexDir/dl")
      .where(col("id_bucket").isin(deltaBuckets: _*))
      .select("doc_id")
  }

  /** Persist an index from an arbitrary (doc_id, text) base relation —
    * the starting point of the incremental lifecycle (the full-corpus
    * [[savePostingsIndex]] specialization serves q127). */
  def savePostingsIndexOf(docs: DataFrame, outDir: String,
      termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, "bucket count must be positive")
    val p = postingsOf(docs)
    p.where(col("term").isNotNull)
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$outDir/postings")
    writeDl(p.select(col("doc_id"), col("dl")).dropDuplicates("doc_id"),
      s"$outDir/dl", "overwrite")
  }

  /** Merge a delta batch of NEW documents into a persisted
    * [[savePostingsIndex]]/[[savePostingsIndexOf]] artifact — the daily-
    * ingest shape a production contamination/retrieval service actually
    * runs (q96's delta model applied to the index): the delta's
    * postings land as APPENDED files in exactly the term buckets its
    * vocabulary hashes to, dl rows append alongside, and nothing
    * already on disk is rewritten — dynamic-partition append touches
    * only the delta's partitions, so merge cost ∝ |delta|, never
    * ∝ |index|. Because every artifact row is per-doc (tf within-doc,
    * dl per-doc) and delta doc_ids are new, base ∪ delta is
    * row-identical to a full rebuild — [[bm25TopKFromIndex]] answers
    * over the merged artifact are therefore EQUAL to full-rebuild
    * answers, which is what the q133 gate pins under q110's own oracle
    * (corpus stats n_docs/Σdl re-derive from the merged dl relation at
    * query time, so they update for free). Replay-safe: doc_ids already
    * in the artifact's dl relation are anti-joined out of the delta up
    * front — one column-pruned scan of the per-doc dl file plus a join
    * ∝ |delta| — so the retry/replay a production ingest eventually
    * does is a no-op instead of silently doubling the doc's postings
    * (PostingsIndexPersistenceSpec pins the replayed merge). Bootstrap:
    * a first delta into an empty artifact (streaming ingest starts
    * cold) has no dl relation to guard against — every delta doc is
    * fresh then, mirroring [[Sketches.appendDailyDelta]]'s first-append
    * path. */
  def appendPostingsDelta(deltaDocs: DataFrame, indexDir: String,
      termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, "bucket count must be positive")
    val spark = deltaDocs.sparkSession
    val dlPath = new org.apache.hadoop.fs.Path(s"$indexDir/dl")
    val fs = dlPath.getFileSystem(spark.sessionState.newHadoopConf())
    SafeSwap.recover(fs, new org.apache.hadoop.fs.Path(s"$indexDir/postings"))
    SafeSwap.recover(fs, dlPath)
    AppendCommit.recover(fs, indexDir)
    // RESURRECTION (the deleted-then-re-appended interaction): a delta
    // doc_id sitting in the tombstone set is being deliberately
    // re-ingested — expunge its dead rows (targeted compaction, cost ∝
    // the overlap's touched buckets) and withdraw its tombstones BEFORE
    // the replay guard runs, so the fresh rows append as new and
    // neither generation double-serves. Crash-converging in both
    // windows: rows-gone-but-still-tombstoned re-detects the overlap on
    // re-run; tombstone-withdrawn-but-rows-absent falls through to the
    // guard, which sees the doc absent and appends it.
    tombstonesOf(spark, indexDir).foreach { dead =>
      val overlap = dead.join(deltaDocs.select("doc_id"), Seq("doc_id")).cache()
      if (overlap.count() > 0) {
        expungePostings(spark, indexDir, overlap)
        val tsTmp = s"$indexDir/tombstones_withdraw_tmp"
        dead.join(overlap, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(tsTmp)
        SafeSwap.swapDir(fs,
          new org.apache.hadoop.fs.Path(s"$indexDir/tombstones"),
          new org.apache.hadoop.fs.Path(tsTmp))
      }
      overlap.unpersist(blocking = false)
    }
    // materialized BEFORE the appends: the second write's source must
    // not re-read the dl file it is itself appending to
    val bucketed = fs.exists(dlPath) &&
      spark.read.parquet(s"$indexDir/dl").columns.contains("id_bucket")
    val fresh = (
      if (!fs.exists(dlPath)) deltaDocs
      else if (bucketed) deltaDocs.join(
        guardHeldIds(spark, indexDir, deltaDocs, DefaultIdBuckets),
        Seq("doc_id"), "left_anti")
      else deltaDocs.join( // pre-layout artifact: full-store guard
        spark.read.parquet(s"$indexDir/dl").select("doc_id"),
        Seq("doc_id"), "left_anti")).cache()
    fresh.count()
    // commit marker: a crash between the two writes rolls both stores
    // back to their recorded listings at the next recover, so the
    // re-run re-admits the whole delta (derived-first order still
    // matters for the cached-plan recache trap on a SUCCESSFUL append)
    AppendCommit.begin(fs, indexDir, Seq("postings", "dl"))
    val p = postingsOf(fresh)
    p.where(col("term").isNotNull)
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .write.mode("append").partitionBy("term_bucket")
      .parquet(s"$indexDir/postings")
    val freshDl = p.select(col("doc_id"), col("dl")).dropDuplicates("doc_id")
    if (bucketed || !fs.exists(dlPath)) writeDl(freshDl, s"$indexDir/dl", "append")
    else freshDl.write.mode("append").parquet(s"$indexDir/dl")
    AppendCommit.commit(fs, indexDir)
    fresh.unpersist(blocking = false)
  }

  /** Retire documents from a persisted postings artifact — the delete
    * half of the index lifecycle (takedowns, re-crawled URLs, licence
    * pulls) q133's append-only half lacks. Tombstones, not rewrites:
    * the delete set lands as appended rows in `$indexDir/tombstones`
    * (cost ∝ |deletes|, nothing on disk rewritten — the same
    * append-economics argument as the postings delta), and serving
    * anti-joins it out ([[bm25TopKFromIndex]]): postings after the
    * term-bucket prune (so the anti-join touches only probed rows) and
    * the dl relation before corpus stats (so n_docs/avgdl/df shrink
    * exactly as a rebuild's would — base − deleted + delta ≡ rebuild,
    * which is what the q142 gate pins under q110's oracle). Idempotent
    * by construction: anti-join semantics make a twice-deleted doc_id
    * harmless. A production index compacts when the tombstone fraction
    * crosses a threshold (rewrite only the touched term buckets); the
    * serve-time anti-join is the correct shape between compactions. */
  def tombstoneDocs(deletedIds: DataFrame, indexDir: String): Unit =
    deletedIds.select(col("doc_id").cast("long").as("doc_id"))
      .write.mode("append").parquet(s"$indexDir/tombstones")

  /** The artifact's tombstone relation, empty if none were ever
    * written. */
  private def tombstonesOf(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    // Hadoop FS, not java.nio: the artifact may live on HDFS/S3
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      Some(spark.read.parquet(s"$indexDir/tombstones").select("doc_id").distinct())
    else None
  }

  /** Expunge the tombstones: rewrite ONLY the term buckets that hold a
    * deleted doc's postings (survivors re-written, dead rows dropped),
    * rewrite the (per-doc, small) dl relation, delete the tombstone
    * set. The production cadence: serve-time anti-joins between
    * compactions, compaction when the tombstone fraction crosses a
    * threshold — and compaction cost ∝ touched buckets, never the
    * artifact (a delete set concentrated in few terms rewrites few
    * directories; the untouched buckets' files survive byte-identical,
    * which the spec pins by mtime). Answer-invisible by construction:
    * the compacted artifact serves exactly what the anti-join served
    * (the q144 gate runs it under q142's oracle). Swaps go through
    * [[SafeSwap]] — live dirs move ASIDE before their rewrites move in,
    * asides are dropped only after all swaps, and the tombstone set is
    * deleted LAST (the commit point) — so a crash anywhere leaves a
    * recoverable pre-compaction state: [[SafeSwap.recover]] runs at the
    * head of this pass and of every serve, and re-running the
    * compaction converges (SafeSwapSpec pins each crash window).
    * Single-writer ownership is unchanged. */
  def compactPostings(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(conf)
    SafeSwap.recover(fs, new org.apache.hadoop.fs.Path(s"$indexDir/postings"))
    SafeSwap.recover(fs, new org.apache.hadoop.fs.Path(s"$indexDir/dl"))
    AppendCommit.recover(fs, indexDir)
    tombstonesOf(spark, indexDir).foreach { dead =>
      expungePostings(spark, indexDir, dead)
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/tombstones"), true)
    }
  }

  /** Drop a dead set's rows from the artifact: only the term buckets
    * holding a dead doc's postings rewrite (bounded collect; untouched
    * buckets' files survive byte-identical), the small per-doc dl
    * relation rewrites wholesale. Shared by [[compactPostings]] (whole
    * tombstone set) and the resurrection path in
    * [[appendPostingsDelta]] (just the re-appended overlap). */
  private def expungePostings(spark: SparkSession, indexDir: String,
      dead: DataFrame): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(conf)
    val postingsRoot = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val dlRoot = new org.apache.hadoop.fs.Path(s"$indexDir/dl")
    val postings = spark.read.parquet(s"$indexDir/postings")
    val touched = postings.join(dead, Seq("doc_id"))
      // partition discovery types term_bucket as INT on read-back
      .select(col("term_bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)) // bounded: ≤ termBuckets values
    if (touched.nonEmpty) {
      val tmp = s"$indexDir/postings_compact_tmp"
      postings.where(col("term_bucket").isin(touched.toIndexedSeq.map(Long.box): _*))
        .join(dead, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").partitionBy("term_bucket").parquet(tmp)
      // a bucket whose every posting was dead has no rewritten dir —
      // the swap moves it aside and replaces it with nothing
      SafeSwap.swapPartitions(fs, postingsRoot,
        new org.apache.hadoop.fs.Path(tmp),
        touched.toIndexedSeq.map(b => s"term_bucket=$b"))
    }
    if (spark.read.parquet(s"$indexDir/dl").columns.contains("id_bucket")) {
      // the dead ids themselves name the touched id_bucket dirs — no
      // store scan; rewrite cost is the touched partitions only
      val touchedIds = dead
        .select(pmod(xxhash64(col("doc_id")), lit(DefaultIdBuckets.toLong)).as("b"))
        .distinct().collect().map(_.getLong(0)) // bounded: <= idBuckets values
      if (touchedIds.nonEmpty) {
        val dlTmp = s"$indexDir/dl_compact_tmp"
        spark.read.parquet(s"$indexDir/dl")
          .where(col("id_bucket").isin(touchedIds.toIndexedSeq.map(Long.box): _*))
          .join(dead, Seq("doc_id"), "left_anti")
          .repartition(col("id_bucket"))
          .write.mode("overwrite").partitionBy("id_bucket").parquet(dlTmp)
        SafeSwap.swapPartitions(fs, dlRoot,
          new org.apache.hadoop.fs.Path(dlTmp),
          touchedIds.toIndexedSeq.map(b => s"id_bucket=$b"))
      }
    } else { // pre-layout artifact: wholesale rewrite
      val dlTmp = s"$indexDir/dl_compact_tmp"
      spark.read.parquet(s"$indexDir/dl")
        .join(dead, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(dlTmp)
      SafeSwap.swapDir(fs, dlRoot, new org.apache.hadoop.fs.Path(dlTmp))
    }
  }

  /** q144: the q142 lifecycle COMPACTED — same base + delta + deletes,
    * but the tombstones are expunged by [[compactPostings]] before
    * serving, so the plan contains no anti-join at all (the artifact
    * itself is the surviving corpus). Gated under q142's oracle: the
    * fifth serving shape, one pinned answer — compaction is
    * answer-invisible in the hash gate, not just in a spec. */
  def bm25TopKCompacted(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32, batchPct: Int = 30,
      deletePct: Int = 10): DataFrame = {
    val indexDir = persistedIndex.getOrCreate(
      spark, s"$dir#compact:$batchPct:$deletePct") { tmp =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        (pmod(col("doc_id") * lit(2654435761L), lit(100)) < batchPct).as("incoming"))
      savePostingsIndexOf(docs.where(!col("incoming")).select("doc_id", "text"), tmp)
      appendPostingsDelta(docs.where(col("incoming")).select("doc_id", "text"), tmp)
      tombstoneDocs(
        docs.where(pmod(col("doc_id") * lit(7919L), lit(100)) < deletePct)
          .select("doc_id"), tmp)
      compactPostings(spark, tmp)
    }
    bm25TopKFromIndex(spark, indexDir, queries, topK, salts)
  }

  /** q160: the FULL lifecycle COMPOSED in one relation — base build
    * (70 %) → delta append (30 %) → tombstone a 10 % delete set
    * spanning both → RE-APPEND half the deleted docs (resurrection —
    * the deleted-then-re-appended interaction the pairwise q142/q144
    * gates can't see) → compact → serve. Gated under q110's oracle
    * restricted to the surviving corpus (everything except deleted AND
    * not re-appended): the whole composition ≡ a fresh build of
    * exactly that corpus. */
  def bm25TopKComposed(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32, batchPct: Int = 30,
      deletePct: Int = 10, reappendPct: Int = 50): DataFrame = {
    val indexDir = persistedIndex.getOrCreate(
      spark, s"$dir#composed:$batchPct:$deletePct:$reappendPct") { tmp =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        (pmod(col("doc_id") * lit(2654435761L), lit(100)) < batchPct).as("incoming"),
        (pmod(col("doc_id") * lit(7919L), lit(100)) < deletePct).as("deleted"))
      savePostingsIndexOf(docs.where(!col("incoming")).select("doc_id", "text"), tmp)
      appendPostingsDelta(docs.where(col("incoming")).select("doc_id", "text"), tmp)
      tombstoneDocs(docs.where(col("deleted")).select("doc_id"), tmp)
      appendPostingsDelta(
        docs.where(col("deleted") &&
            pmod(col("doc_id") * lit(104729L), lit(100)) < reappendPct)
          .select("doc_id", "text"), tmp)
      compactPostings(spark, tmp)
    }
    bm25TopKFromIndex(spark, indexDir, queries, topK, salts)
  }

  /** q142: BM25 over the FULL index lifecycle — base build + delta
    * append + tombstoned deletes, served from the merged artifact.
    * The corpus splits by q96's delta rule (30 % incoming), and a
    * deterministic 10 % delete set (spanning BOTH base and delta docs —
    * deletes must work against appended rows too) is tombstoned. Gated
    * under q110's oracle over the surviving corpus: base − deleted +
    * delta ≡ full rebuild on (corpus − deleted). */
  def bm25TopKWithTombstones(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32, batchPct: Int = 30,
      deletePct: Int = 10): DataFrame = {
    val indexDir = persistedIndex.getOrCreate(
      spark, s"$dir#tomb:$batchPct:$deletePct") { tmp =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        (pmod(col("doc_id") * lit(2654435761L), lit(100)) < batchPct).as("incoming"))
      savePostingsIndexOf(docs.where(!col("incoming")).select("doc_id", "text"), tmp)
      appendPostingsDelta(docs.where(col("incoming")).select("doc_id", "text"), tmp)
      tombstoneDocs(
        docs.where(pmod(col("doc_id") * lit(7919L), lit(100)) < deletePct)
          .select("doc_id"), tmp)
    }
    bm25TopKFromIndex(spark, indexDir, queries, topK, salts)
  }

  /** q133: BM25 served from an INCREMENTALLY BUILT index — the corpus is
    * split by q96's deterministic delta rule (pmod(doc_id·2654435761,
    * 100) < batchPct = the incoming batch), the base 70 % is persisted,
    * the 30 % delta merged via [[appendPostingsDelta]], and the merged
    * artifact serves the batch. Gated under q110's oracle: merged-index
    * answers ≡ full-rebuild answers ≡ live answers — the fourth serving
    * shape, one pinned answer. */
  def bm25TopKIncremental(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32, batchPct: Int = 30): DataFrame = {
    val indexDir = persistedIndex.getOrCreate(spark, s"$dir#incremental:$batchPct") { tmp =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"),
        (pmod(col("doc_id") * lit(2654435761L), lit(100)) < batchPct).as("incoming"))
      savePostingsIndexOf(docs.where(!col("incoming")).select("doc_id", "text"), tmp)
      appendPostingsDelta(docs.where(col("incoming")).select("doc_id", "text"), tmp)
    }
    bm25TopKFromIndex(spark, indexDir, queries, topK, salts)
  }

  /** Serve BM25 from a persisted [[savePostingsIndex]] artifact — NO
    * corpus relation in the plan at all (the restarted-service shape).
    * Answers are pinned IDENTICAL to the live [[bm25TopK]] modes
    * (PostingsIndexPersistenceSpec; the q127 gate runs this under
    * q110's own oracle). The query batch's term buckets are computed
    * from a LOCAL relation (bounded by the batch, no corpus work) and
    * pushed as a static `term_bucket IN (...)` partition filter, so the
    * scan reads only the probed directories. */
  def bm25TopKFromIndex(spark: SparkSession, indexDir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32,
      termBuckets: Int = 64): DataFrame = {
    import spark.implicits._
    val queryTerms = queries.toDF("query_id", "qtext")
      .select(col("query_id").cast("long").as("query_id"),
        explode(TextAnalysis.tokens(col("qtext"))).as("term"))
      .distinct()
    rankedFromIndex(spark, indexDir, queryTerms, topK, salts,
      excludeSelf = false, termBuckets = termBuckets)
  }

  /** BM25 ranking from a persisted artifact for an arbitrary
    * (query_id, term) relation — the from-index engine of
    * [[bm25TopKFromIndex]] (literal queries) and the hybrid fusion's
    * lexical pool ([[Hybrid.rrfTopKFromIndexes]], corpus-derived
    * queries). The corpus is structurally unreachable (the by-name docs
    * argument throws if analyzed). */
  private[ops] def rankedFromIndex(spark: SparkSession, indexDir: String,
      queryTerms: DataFrame, topK: Int, salts: Int,
      excludeSelf: Boolean, termBuckets: Int = 64): DataFrame = {
    // a crashed compaction may have left partitions aside — restore
    // them before scanning (two fs.exists when no crash happened)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    SafeSwap.recover(fs, new org.apache.hadoop.fs.Path(s"$indexDir/postings"))
    SafeSwap.recover(fs, new org.apache.hadoop.fs.Path(s"$indexDir/dl"))
    AppendCommit.recover(fs, indexDir)
    val buckets = queryTerms
      .select(pmod(xxhash64(col("term")), lit(termBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // local relation: no corpus scan
    val postingsLive = spark.read.parquet(s"$indexDir/postings")
      .where(col("term_bucket").isin(buckets: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    val dlLive = dlStore(spark, indexDir)
    // tombstoned docs drop out at serve time: postings AFTER the bucket
    // prune (the anti-join touches only probed rows), dl BEFORE corpus
    // stats (n_docs/avgdl/df shrink exactly as a rebuild's would). No
    // forced broadcast — a delete set can grow unboundedly between
    // compactions; AQE picks the build side
    val (postings, dl) = tombstonesOf(spark, indexDir) match {
      case Some(dead) =>
        (postingsLive.join(dead, Seq("doc_id"), "left_anti"),
          dlLive.join(dead, Seq("doc_id"), "left_anti"))
      case None => (postingsLive, dlLive)
    }
    bm25Rank(
      sys.error("the persisted-index path must not touch the corpus"),
      Some((postings, dl)), queryTerms, topK, salts, excludeSelf = excludeSelf)
  }

  /** The session's persisted postings artifact for `dir`, built on
    * first use — shared by the q127 gate and the hybrid from-artifact
    * serving path. */
  private[ops] def persistedPostingsDir(spark: SparkSession, dir: String): String =
    persistedIndex.getOrCreate(spark, dir)(savePostingsIndex(spark, dir, _))

  /** One persisted-index artifact per (session, dir), built on first
    * use — the q127 gate entry: the determinism contract (a query
    * surface may be invoked repeatedly) meets the write-once lifecycle
    * via the same memoization discipline as the session stages. */
  private val persistedIndex = new TempArtifacts("graft-bm25-index")
  private[ops] def persistedIndexDirFor(spark: SparkSession, dir: String): Option[String] =
    persistedIndex.peek(spark, dir)

  /** q127: [[bm25TopK]] served entirely from the persisted parquet
    * index — same oracle as q110/q124, which is the point: three
    * physical serving shapes (scan-time prune / session index /
    * restartable on-disk index), one pinned answer. */
  def bm25TopKPersisted(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)] = DefaultQueries,
      topK: Int = 5, salts: Int = 32): DataFrame =
    bm25TopKFromIndex(spark, persistedPostingsDir(spark, dir), queries, topK, salts)

  private def bm25Rank(docs: => DataFrame, index: Option[(DataFrame, DataFrame)],
      queryTerms: DataFrame, topK: Int, salts: Int, excludeSelf: Boolean): DataFrame = {
    // by-name docs + lazy toks: the persisted-index path serves with NO
    // corpus relation at all (a restarted service has only the index),
    // so the tokenize plan must not even be ANALYZED when an index is
    // supplied
    lazy val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val postings = index.map(_._1)
    val dl = index match {
      case Some((_, d)) => d
      case None => toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    }

    // 1-row corpus stats; avgdl written as sum*1.0/count in BOTH engines
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl", col("sum_dl") * lit(1.0) / col("n_docs"))

    // candidate postings: only (doc, term) pairs where term is a query
    // term survive — default mode prunes BEFORE the tf aggregation so
    // the corpus-side shuffle carries only query-term positions
    val tf = postings match {
      case Some(p) =>
        p.join(broadcast(queryTerms), "term")
          .select(col("query_id"), col("doc_id"), col("term"), col("tf"))
      case None =>
        toks.select(col("doc_id"), explode(col("toks")).as("term"))
          .join(broadcast(queryTerms), "term")
          .groupBy(col("query_id"), col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
    }

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

    val scoredAll = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("query_id"), col("doc_id"), wMicros.as("sm"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("sm")).as("sm"))
    // df/idf stay corpus-true; self-exclusion only removes the
    // degenerate hit from the RANKING
    val scored =
      if (excludeSelf) scoredAll.where(col("doc_id") =!= col("query_id"))
      else scoredAll

    rankTopK(scored, topK, salts)
  }

  /** q119: retrieval-based contamination TRIAGE — for each eval doc
    * (the q69 stand-in eval set, `doc_id % 97 == 0`), use its opening
    * tokens as a search query, retrieve the top-k training docs by
    * BM25 (the eval doc itself excluded — it is a guaranteed degenerate
    * hit), and count the word 5-grams each hit shares with that eval
    * doc. The triage read behind "the benchmark leaked": gram overlap
    * (q69) catches verbatim contamination; ranking by BM25 surfaces the
    * near-verbatim and paraphrase-adjacent docs an n-gram filter
    * misses, ordered by how retrievable they are from the eval prompt.
    *
    * Scale shape: the postings join fans out per QUERY CONTAINING the
    * term, so the cost is Σ_positions × (queries sharing that term) —
    * linear in the corpus only while the query batch is bounded.
    * `queryCap` bounds the batch (eval ids below it): the stand-in
    * eval-id rule (`% 97`) grows WITH the corpus, and an uncapped run
    * at the 100× corpus (≈5 200 simultaneous queries over a small
    * shared vocabulary) measured 56–85 s of pure fan-out vs ~1 s
    * capped. The full eval sweep is [[contaminationRetrievalSweep]] —
    * it pages successive id-range batches exactly how a production
    * triage job pages through a benchmark suite, keeping every batch's
    * shuffle bounded regardless of corpus or eval-suite size. The
    * default here covers every eval id at the sf0.01 gate (all ids
    * < 500), so the oracle pins the same relation.
    *
    * The gram join runs only on |queries|·k retrieved pairs versus the
    * (broadcast) eval grams — the corpus gram relation streams past
    * it, never shuffling. */
  def contaminationRetrieval(spark: SparkSession, dir: String,
      prefixTokens: Int = 8, topK: Int = 5, salts: Int = 32,
      queryCap: Long = 10000L): DataFrame =
    contaminationRetrievalOf(Tables.documents(spark, dir), prefixTokens, topK, salts,
      queryCap)

  /** The q119 pipeline over any (doc_id, text) relation — split out so
    * the planted-contamination spec can drive a corpus where an eval
    * doc's passage verbatim-leaks into a known training doc. */
  private[graft] def contaminationRetrievalOf(docs: DataFrame,
      prefixTokens: Int, topK: Int, salts: Int,
      queryCap: Long = 10000L): DataFrame =
    contaminationBatch(docs, None, TextAnalysis.docGrams(docs),
      col("doc_id") % 97 === 0 && col("doc_id") < queryCap,
      prefixTokens, topK, salts)
      .orderBy("query_id", "rank")

  /** One id-range batch of the contamination-triage pipeline: eval docs
    * selected by `evalFilter` become the query batch; retrieval +
    * shared-gram counting run exactly as in [[contaminationRetrievalOf]].
    * Returns the relation UNORDERED — callers sort (the sweep sorts once
    * over the union, not per batch).
    *
    * Batch-independence argument (why a paged sweep equals one giant
    * batch, pinned by ContaminationSweepSpec): every per-(query, doc)
    * score is built from batch-INDEPENDENT statistics — df is counted
    * over all docs containing the term (the candidate-postings relation
    * restricted to one term is the same regardless of which queries
    * brought the term in), n_docs/avgdl are corpus constants, and
    * ranking is a within-query window. So partitioning the eval set by
    * id range changes WHICH rows a batch emits, never their values. */
  private def contaminationBatch(docs: DataFrame, index: Option[(DataFrame, DataFrame)],
      grams: DataFrame, evalFilter: org.apache.spark.sql.Column,
      prefixTokens: Int, topK: Int, salts: Int): DataFrame =
    sharedGramCounts(grams,
      rankedBatch(docs, index, evalFilter, prefixTokens, topK, salts), evalFilter)

  /** The retrieval HALF of a batch: eval docs under `evalFilter` become
    * the query set; emits the ranked (query_id, doc_id, score, rank)
    * relation, unordered. */
  private[ops] def rankedBatch(docs: DataFrame, index: Option[(DataFrame, DataFrame)],
      evalFilter: org.apache.spark.sql.Column,
      prefixTokens: Int, topK: Int, salts: Int): DataFrame = {
    val queryTerms = docs.where(evalFilter)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(slice(TextAnalysis.tokens(col("text")), 1, prefixTokens)))
          .as("term"))
    bm25Rank(docs, index, queryTerms, topK, salts, excludeSelf = true)
  }

  /** The gram-counting HALF: annotate a ranked relation with the word
    * 5-grams each hit shares with its eval query. ONE corpus-gram pass
    * per call — the sweep calls this once over the UNION of its pages'
    * rankings instead of once per page (the gram join cost is a corpus
    * scan against the broadcast pair set; paying it per page tripled
    * q123's 100× cost for zero isolation benefit, since the pair set is
    * already bounded by pages × queries × k). */
  private def sharedGramCounts(grams: DataFrame, ranked: DataFrame,
      evalFilter: org.apache.spark.sql.Column): DataFrame = {
    val evalGrams = grams.where(evalFilter)
      .select(col("doc_id").as("query_id"), col("gram"))
    val pairGrams = ranked.select(col("query_id"), col("doc_id"))
      .join(evalGrams, "query_id") // |pairs| × eval grams — broadcast-sized
    val shared = grams
      .join(broadcast(pairGrams), Seq("doc_id", "gram"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
    ranked.join(shared, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
  }

  /** Batches the most recent [[contaminationRetrievalSweep]] paged
    * through in this JVM (−1 before any run) — bench telemetry, the
    * q59 rounds-count discipline: "per-batch fan-out stays bounded as
    * the eval suite grows" becomes checkable from the artifact. */
  val lastSweepBatches = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Session word-5-gram stage — (doc_id, gram), distinct per doc,
    * cached once per (session, dir) so a paged sweep does not re-derive
    * corpus grams per batch. */
  private def gramsStage(spark: SparkSession, dir: String): DataFrame =
    gramsCache.getOrBuild((spark, dir)) {
      val built = TextAnalysis.docGrams(Tables.documents(spark, dir)).cache()
      built.count()
      built
    }

  /** The FULL q119 eval sweep: pages the eval set through id-range
    * batches of `batchWidth` and unions the per-batch verdicts — the
    * API form of the pattern that prevents the measured uncapped-batch
    * cliff (the `% 97` eval-id rule grows WITH the corpus; one giant
    * batch at the 100× corpus ran 56–85 s of postings fan-out, while
    * every `batchWidth`-bounded batch keeps Σ_positions × queries-per-
    * term — and with it each batch's shuffle — bounded regardless of
    * corpus or eval-suite size).
    *
    * Sweep ≡ one uncapped run, by construction: scores depend only on
    * batch-independent statistics (see [[contaminationBatch]]), so the
    * union over disjoint exhaustive id ranges emits exactly the
    * uncapped relation (ContaminationSweepSpec pins it at gate scale).
    *
    * Cost discipline: the corpus-side artifacts are session stages
    * built ONCE — the [[postingsStage]] inverted index replaces a
    * per-batch corpus tokenize (the sweep's dominant cost at 100×
    * otherwise) and [[gramsStage]] does the same for the 5-gram
    * relation; each batch then touches only its own query terms'
    * postings. The driver-side loop is control flow only (one `max`
    * scalar for the id range — the q59 bounded-loop shape); all data
    * stays distributed, and the union executes as independent bounded
    * stages over the shared cached relations. */
  def contaminationRetrievalSweep(spark: SparkSession, dir: String,
      prefixTokens: Int = 8, topK: Int = 5, salts: Int = 32,
      batchWidth: Long = 10000L, maxQueryId: Long = Long.MaxValue): DataFrame = {
    require(batchWidth > 0, "batchWidth must be positive")
    val docs = Tables.documents(spark, dir)
    val index = indexStages(spark, dir)
    val grams = gramsStage(spark, dir)
    // `maxQueryId` bounds the swept id WINDOW (q119's queryCap
    // discipline at the sweep level): the default sweeps the full id
    // space — pages × per-page cost, the honest price of a full eval
    // sweep — while a bounded window keeps page count scale-invariant
    // (the q123 gate registration pins 3 fixed pages at every SF; the
    // full-space sweep at a 100× corpus is 50 pages and is priced as
    // such, not benched per round)
    val maxId = Option(docs.agg(max(col("doc_id"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val hi = math.min(maxId, maxQueryId - 1)
    val windowFilter = col("doc_id") % 97 === 0 && col("doc_id") < lit(maxQueryId)
    // pages bound the RETRIEVAL fan-out (the per-page shuffle is what
    // must stay constant); the gram annotation runs ONCE over the union
    // of all pages' rankings — the pair set is bounded either way, and
    // a per-page gram join just re-scans the corpus grams per page
    val batches = (0L to math.max(hi, 0L) by batchWidth).map { lo =>
      rankedBatch(docs, Some(index),
        windowFilter && col("doc_id") >= lo && col("doc_id") < lo + batchWidth,
        prefixTokens, topK, salts)
    }
    lastSweepBatches.set(batches.size)
    sharedGramCounts(grams, batches.reduce(_.unionAll(_)), windowFilter)
      .orderBy("query_id", "rank")
  }

  /** Salted two-phase top-k over a (query_id, doc_id, sm) relation. */
  private def rankTopK(scored: DataFrame, topK: Int, salts: Int): DataFrame = {
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
