package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-dedup fingerprint artifact — the text-modality
  * membership store the streaming curation loop probes: "has the
  * corpus already admitted a doc with this normalized fingerprint?"
  * (q30/q31's exact rung, [[Pipeline.curatedDelta]]'s vs-corpus kill)
  * answered WITHOUT scanning corpus text — the store holds one narrow
  * (doc_id, fp) row per admitted doc.
  *
  * Layout (the bucket-pruned probe discipline of
  * [[LshIndex]]/[[ImageIndex]]/[[Retrieval]]): rows land partitioned by
  * `fp_bucket = pmod(xxhash64(fp), B)`, and a probe batch collects its
  * own fp-bucket vocabulary locally (≤ B longs) and pushes a STATIC
  * partition filter — probe cost ∝ the batch's bucket vocabulary,
  * never the corpus. `B` is frozen in a meta store at build time
  * (mixing two moduli in one store silently defeats the prune — the
  * [[LshIndex.readMeta]] argument).
  *
  * Lifecycle parity with the other doc-keyed families: base build →
  * replay-guarded delta append (bootstrap-safe) → tombstone →
  * touched-partition compaction. No derived second store, so appends
  * are single-store and need no [[AppendCommit]] marker.
  */
object FingerprintIndex {

  /** Partition count of the fingerprint store. */
  val DefaultFpBuckets = 64

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def fsPath(p: String) = new org.apache.hadoop.fs.Path(p)

  private def recoverStores(spark: SparkSession, indexDir: String): Unit = {
    val fs = hadoopFs(spark, indexDir)
    SafeSwap.recover(fs, fsPath(s"$indexDir/fingerprints"))
  }

  private def readMeta(spark: SparkSession, indexDir: String): Int =
    spark.read.parquet(s"$indexDir/meta").head().getAs[Int]("fp_buckets")

  private def fpRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  private def writeFps(rows: DataFrame, fpBuckets: Int, indexDir: String,
      mode: String): Unit =
    rows.withColumn("fp_bucket", pmod(xxhash64(col("fp")), lit(fpBuckets.toLong)))
      .write.mode(mode).partitionBy("fp_bucket").parquet(s"$indexDir/fingerprints")

  /** Base build from a (doc_id, text) relation. */
  def saveFingerprintIndexOf(docs: DataFrame, outDir: String,
      fpBuckets: Int = DefaultFpBuckets): Unit = {
    require(fpBuckets > 0, "bucket count must be positive")
    val spark = docs.sparkSession
    writeFps(fpRows(docs), fpBuckets, outDir, "overwrite")
    import spark.implicits._
    Seq(fpBuckets).toDF("fp_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/meta")
  }

  /** Replay-guarded delta append: doc_ids the store already holds
    * anti-join out (a retried ingest is a no-op); a first delta into an
    * empty dir IS the base build; a delta doc_id present in the
    * tombstone set is being deliberately RE-INGESTED — its dead rows
    * expunge and its tombstone withdraws BEFORE the replay guard runs,
    * so the fresh row appends and neither generation double-serves
    * (the [[LshIndex.appendLshDelta]] resurrection contract; without
    * it, the guard would silently absorb the re-ingest and the next
    * compaction would erase the doc for good). Appended rows land as
    * dynamic partition appends touching only the delta's fp buckets. */
  def appendFingerprintDelta(deltaDocs: DataFrame, indexDir: String,
      fpBuckets: Int = DefaultFpBuckets): Unit = {
    val spark = deltaDocs.sparkSession
    val fs = hadoopFs(spark, indexDir)
    recoverStores(spark, indexDir)
    if (!fs.exists(fsPath(s"$indexDir/meta"))) {
      saveFingerprintIndexOf(deltaDocs, indexDir, fpBuckets)
      return
    }
    tombstonesOf(spark, indexDir).foreach { dead =>
      val overlap = dead.join(deltaDocs.select("doc_id"), Seq("doc_id")).cache()
      if (overlap.count() > 0) {
        expunge(spark, indexDir, overlap)
        val tsTmp = s"$indexDir/tombstones_withdraw_tmp"
        dead.join(overlap, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(tsTmp)
        SafeSwap.swapDir(fs, fsPath(s"$indexDir/tombstones"), fsPath(tsTmp))
      }
      overlap.unpersist(blocking = false)
    }
    val frozen = readMeta(spark, indexDir)
    val deltaFps = fpRows(deltaDocs)
    val fresh = deltaFps.join(guardHeldIds(spark, indexDir, deltaFps, frozen),
      Seq("doc_id"), "left_anti")
    writeFps(fresh, frozen, indexDir, "append")
  }

  /** The replay guard's DELTA-PROPORTIONAL store scan: the held doc_ids
    * the incoming delta could possibly collide with. `fp` is a pure
    * function of the text, so a REPLAYED doc's row sits in exactly the
    * fp_bucket its delta row hashes to — the delta's bucket vocabulary
    * (collected locally, ≤ fpBuckets longs) pushes a static partition
    * filter into the guard scan, the same prune [[probeFingerprints]]
    * runs two lines later. Guard cost is ∝ the delta's bucket
    * vocabulary, never the corpus — without the prune, every nightly
    * append paid a corpus-wide narrow-column scan just to discover the
    * delta was (mostly) fresh. Sound under the guard's own replay
    * semantics (same doc_id ⇒ same bytes): a doc_id re-ingested with
    * DIFFERENT text is a new document version, which this store's
    * contract routes through tombstone + re-append, not the guard. */
  private[graft] def guardHeldIds(spark: SparkSession, indexDir: String,
      deltaFps: DataFrame, fpBuckets: Int): DataFrame = {
    val deltaBuckets = deltaFps
      .select(pmod(xxhash64(col("fp")), lit(fpBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // local: ≤ fpBuckets values
    spark.read.parquet(s"$indexDir/fingerprints")
      .where(col("fp_bucket").isin(deltaBuckets: _*))
      .select("doc_id")
  }

  /** Which held docs does each probe doc exactly duplicate (normalized
    * fingerprint equality)? Output: (probe_id, doc_id) — `doc_id` the
    * held original. The store scan prunes to the batch's fp-bucket
    * partitions; tombstoned docs never flag; a replayed doc_id does not
    * flag itself. NO forced broadcast of the probe side: callers range
    * from streaming micro-batches (tiny — AQE broadcasts them on its
    * own) to [[Pipeline.curatedDeltaFromIndex]] handing in 30–60 % of
    * the corpus, where a forced broadcast risks driver/executor OOM at
    * real scale; the bucket prune on the store side bounds the join
    * either way, so the hint is all risk and no win. */
  def probeFingerprints(probeDocs: DataFrame, indexDir: String): DataFrame = {
    val spark = probeDocs.sparkSession
    recoverStores(spark, indexDir)
    val fpBuckets = readMeta(spark, indexDir)
    val probes = fpRows(probeDocs).select(col("doc_id").as("probe_id"), col("fp"))
    val probeBuckets = probes
      .select(pmod(xxhash64(col("fp")), lit(fpBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // local: ≤ fpBuckets values
    val pruned = spark.read.parquet(s"$indexDir/fingerprints")
      .where(col("fp_bucket").isin(probeBuckets: _*))
      .select(col("doc_id"), col("fp"))
    val held = tombstonesOf(spark, indexDir) match {
      case Some(dead) => pruned.join(dead, Seq("doc_id"), "left_anti")
      case None => pruned
    }
    probes.join(held, Seq("fp"))
      .where(col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"))
      .distinct()
      .orderBy("probe_id", "doc_id")
  }

  /** Retire docs — tombstones, not rewrites; idempotent. */
  def tombstoneDocs(deletedIds: DataFrame, indexDir: String): Unit =
    deletedIds.select(col("doc_id").cast("long").as("doc_id"))
      .write.mode("append").parquet(s"$indexDir/tombstones")

  private def tombstonesOf(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = fsPath(s"$indexDir/tombstones")
    if (hadoopFs(spark, indexDir).exists(p))
      Some(spark.read.parquet(s"$indexDir/tombstones").select("doc_id").distinct())
    else None
  }

  /** Drop a dead set's rows from the store: only the fp_bucket
    * partitions holding a dead doc's row rewrite (named by joining the
    * dead set against the store — cost ∝ |dead| + touched partitions);
    * crash-safe via [[SafeSwap]]. Shared by [[compactFingerprintIndex]]
    * (whole tombstone set) and the resurrection path in
    * [[appendFingerprintDelta]] (the re-ingested overlap only). */
  private def expunge(spark: SparkSession, indexDir: String,
      dead: DataFrame): Unit = {
    val fs = hadoopFs(spark, indexDir)
    val store = spark.read.parquet(s"$indexDir/fingerprints")
    val touched = store.join(dead, Seq("doc_id"))
      .select(col("fp_bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)) // bounded: ≤ fpBuckets values
    if (touched.nonEmpty) {
      val tmp = s"$indexDir/fingerprints_compact_tmp"
      store.where(col("fp_bucket").isin(touched.toIndexedSeq.map(Long.box): _*))
        .join(dead, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").partitionBy("fp_bucket").parquet(tmp)
      SafeSwap.swapPartitions(fs, fsPath(s"$indexDir/fingerprints"), fsPath(tmp),
        touched.toIndexedSeq.map(b => s"fp_bucket=$b"))
    }
  }

  /** Expunge the tombstones ([[expunge]] over the whole set), tombstones
    * deleted LAST (the commit point). */
  def compactFingerprintIndex(spark: SparkSession, indexDir: String): Unit = {
    val fs = hadoopFs(spark, indexDir)
    recoverStores(spark, indexDir)
    if (!fs.exists(fsPath(s"$indexDir/fingerprints"))) {
      // tombstones against a store that was never built: nothing holds
      // the ids, so the retire is already in effect
      fs.delete(fsPath(s"$indexDir/tombstones"), true)
      return
    }
    tombstonesOf(spark, indexDir).foreach { dead =>
      expunge(spark, indexDir, dead)
      fs.delete(fsPath(s"$indexDir/tombstones"), true)
    }
  }
}
