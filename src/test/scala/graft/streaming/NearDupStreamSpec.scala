package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{Dedup, Tables}

/** The streaming near-dup ingest gate must flag exactly the docs the
  * batch banding would flag against the same index — stream and batch
  * share the band-key construction, these pin that it stays true. */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("stream-static near-dup candidates match the batch band-collision set") {
    val dir = Files.createTempDirectory("graft-neardup-stream")
    Files.copy(java.nio.file.Path.of(s"$sfDir/documents.parquet"),
      dir.resolve("documents_1.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // index over the lower half of the corpus — the "accumulated" side
    val half = Dedup.bandsOf(Dedup.minhashSignatures(spark, sfDir), 8, 2)
      .where(col("doc_id") % 2 === 0)
      .select("band", "band_key").distinct().cache()

    val stream = DocumentsStreaming.readDocuments(spark, dir.toString)
    EventsStreaming.runToMemory(
      DocumentsStreaming.nearDupCandidates(stream, half),
      "neardup_stream", OutputMode.Append())
    val streamed = spark.table("neardup_stream")
      .select("doc_id", "band", "band_key").distinct()

    val batch = DocumentsStreaming.nearDupCandidates(
      Tables.documents(spark, sfDir), half)
      .select("doc_id", "band", "band_key").distinct()

    assert(streamed.count() > 0, "no collisions at all — index or keys broken")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "stream and batch collision sets diverge")
    // the big-index scale path (shuffle semi-join instead of broadcast)
    // must produce the identical verdict set — only the join strategy
    // may differ, never the semantics
    val shuffled = DocumentsStreaming.nearDupCandidates(
      Tables.documents(spark, sfDir), half, broadcastIndex = false)
      .select("doc_id", "band", "band_key").distinct()
    assert(shuffled.except(batch).isEmpty && batch.except(shuffled).isEmpty,
      "the shuffle-join scale path diverges from the broadcast path")
    // every even doc collides with itself through the index
    val evens = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 2 === 0).select("doc_id")
    val missing = evens.join(streamed.select("doc_id").distinct(),
      Seq("doc_id"), "left_anti").count()
    assert(missing == 0, s"$missing indexed docs failed to collide with their own bands")
  }

  test("the gate is stateless across micro-batches: two triggers, same verdicts") {
    val dir = Files.createTempDirectory("graft-neardup-stream2")
    // two files -> two micro-batches at maxFilesPerTrigger=1; doc_ids
    // shift in the second copy so batches carry distinct docs
    Files.copy(java.nio.file.Path.of(s"$sfDir/documents.parquet"),
      dir.resolve("documents_1.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val shifted = Tables.documents(spark, sfDir)
      .withColumn("doc_id", col("doc_id") + 100000L)
    shifted.write.mode("append").parquet(dir.toString)

    val idx = Dedup.bandIndex(spark, sfDir).cache()
    val stream = DocumentsStreaming.readDocuments(spark, dir.toString)
    EventsStreaming.runToMemory(
      DocumentsStreaming.nearDupCandidates(stream, idx),
      "neardup_stream2", OutputMode.Append())
    val streamed = spark.table("neardup_stream2")
      .select("doc_id", "band", "band_key").distinct()

    val batchInput = spark.read.parquet(dir.toString)
    val batch = DocumentsStreaming.nearDupCandidates(batchInput, idx)
      .select("doc_id", "band", "band_key").distinct()
    // same text at a shifted id must collide identically (keys are
    // content-only), and the per-batch verdicts must union to the batch
    // answer — no state carried or lost between triggers
    assert(streamed.where(col("doc_id") >= 100000L).count() ==
      streamed.where(col("doc_id") < 100000L).count(),
      "shifted copies must collide identically to their originals")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "multi-batch stream diverges from the batch answer")
  }

  test("stateful gate: a duplicate in a LATER micro-batch than its original is caught") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-neardup-state")
    // trigger 1: two unrelated originals
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(dir.resolve("batch1").toString)
    val stream = DocumentsStreaming.readDocuments(spark, dir.resolve("batch1").toString)

    // drive triggers by hand so the arrival ORDER is pinned: batch 1
    // processes fully before batch 2's files exist
    val q = DocumentsStreaming.nearDupStateful(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("neardup_state").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("neardup_state").count()
      assert(afterFirst == 0, s"originals must not self-flag ($afterFirst hits)")

      // trigger 2: doc 11 duplicates doc 1 VERBATIM, 12 is fresh, 13
      // duplicates 12 within the same trigger
      Seq((11L, "alpha beta gamma delta epsilon zeta eta theta"),
          (12L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
          (13L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
        .toDF("doc_id", "text").coalesce(1) // ONE file -> one trigger, arrival order pinned
        .write.mode("append").parquet(dir.resolve("batch1").toString)
      q.processAllAvailable()
    } finally q.stop()

    val hits = spark.table("neardup_state")
      .select("doc_id", "orig_id").distinct()
      .as[(Long, Long)].collect().toSet
    // the cross-batch duplicate is caught against its trigger-1 original
    // (the case the stream-static index gate structurally misses), and
    // the within-batch duplicate against its same-trigger original
    assert(hits == Set((11L, 1L), (13L, 12L)), s"got $hits")
    // identical text collides on ALL 4 bands
    assert(spark.table("neardup_state").where(col("doc_id") === 11L).count() == 4)
  }

  test("the Bloom rung is a superset of the exact gate with zero false negatives") {
    val docs = Tables.documents(spark, sfDir)
    val idx = Dedup.bandIndex(spark, sfDir).cache()
    val exact = DocumentsStreaming.nearDupCandidates(docs, idx)
      .select("doc_id", "band", "band_key")
    val bloom = Dedup.bandIndexBloom(spark, sfDir)
    val bloomed = DocumentsStreaming.nearDupCandidatesBloom(docs, bloom)
      .select("doc_id", "band", "band_key")
    // zero false negatives: every exact collision survives the Bloom
    assert(exact.except(bloomed).isEmpty,
      "Bloom gate dropped a genuine band collision — false negative")
    // false positives exist only at ~fpp: the extra rows are bounded
    val (nExact, nBloom) = (exact.count(), bloomed.count())
    assert(nBloom >= nExact)
    val total = docs.count() * 4 // band rows probed (4 bands per doc)
    assert(nBloom - nExact <= math.max(50L, total / 20),
      s"false-positive volume implausibly high: $nExact exact vs $nBloom bloom")
  }

  test("bandIndex covers every band key the pair stage joins on") {
    val idx = Dedup.bandIndex(spark, sfDir)
    val all = Dedup.bandsOf(Dedup.minhashSignatures(spark, sfDir), 8, 2)
      .select("band", "band_key").distinct()
    assert(idx.except(all).isEmpty && all.except(idx).isEmpty,
      "bandIndex diverges from the batch banding relation")
  }
}
