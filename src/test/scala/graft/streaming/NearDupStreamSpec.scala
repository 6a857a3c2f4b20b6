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
    // every even doc collides with itself through the index
    val evens = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 2 === 0).select("doc_id")
    val missing = evens.join(streamed.select("doc_id").distinct(),
      Seq("doc_id"), "left_anti").count()
    assert(missing == 0, s"$missing indexed docs failed to collide with their own bands")
  }

  test("bandIndex covers every band key the pair stage joins on") {
    val idx = Dedup.bandIndex(spark, sfDir)
    val all = Dedup.bandsOf(Dedup.minhashSignatures(spark, sfDir), 8, 2)
      .select("band", "band_key").distinct()
    assert(idx.except(all).isEmpty && all.except(idx).isEmpty,
      "bandIndex diverges from the batch banding relation")
  }
}
