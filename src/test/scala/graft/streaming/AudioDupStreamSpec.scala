package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{MediaRecord, Multimodal}

/** The stateful audio ingest gate must connect a gain-scaled re-master
  * to an original that arrived in an EARLIER trigger — the duplicate
  * class exact payload hashing misses entirely (every byte differs) and
  * a stream-static index can only see after a rebuild. Stream and batch
  * (q134) share the energy-gradient fingerprint and band-key
  * construction verbatim. */
class AudioDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A real 16-bit mono WAV whose 64 frames carry the given amplitudes
    * at the given gain — [[graft.ops.AudioDupsSpec]]'s toneData shape. */
  private def wavOf(amps: Array[Int], gain: Int, spf: Int, rate: Int): Array[Byte] = {
    val data = new Array[Byte](amps.length * spf * 2)
    for (f <- amps.indices; s <- 0 until spf) {
      val v = amps(f) * gain
      val off = (f * spf + s) * 2
      data(off) = (v & 0xff).toByte
      data(off + 1) = ((v >> 8) & 0xff).toByte
    }
    Multimodal.wavBytes(rate, 1, 16, data)
  }

  test("stateful gate: a gain-scaled re-master in a LATER trigger is caught") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-audiodup-state")
    val rng = new Random(61)
    val ampsA = Array.fill(64)(rng.nextInt(256))
    val ampsB = Array.fill(64)(rng.nextInt(256))
    // trigger 1: two originals (different recordings)
    Seq(MediaRecord(1L, wavOf(ampsA, gain = 1, spf = 8, rate = 8000)),
        MediaRecord(2L, wavOf(ampsB, gain = 2, spf = 16, rate = 16000)))
      .toDS().toDF().coalesce(1)
      .write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("doc_id LONG, payload BINARY")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.resolve("in").toString)
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))
    val q = DocumentsStreaming.audioDupStateful(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("audiodup_state").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("audiodup_state").count()
      assert(afterFirst == 0, s"originals must not self-flag ($afterFirst hits)")

      // trigger 2: 11 = re-master of 1 (gain 3, different frame width
      // AND rate — byte-unrelated to trigger 1's payload), 12 = novel
      // recording, 13 = undecodable garbage, 14 = too short to
      // fingerprint (< 64 samples)
      Seq(MediaRecord(11L, wavOf(ampsA, gain = 3, spf = 16, rate = 16000)),
          MediaRecord(12L, wavOf(Array.fill(64)(rng.nextInt(256)), 1, 8, 8000)),
          MediaRecord(13L, "not audio at all".getBytes("UTF-8")),
          MediaRecord(14L, Multimodal.wavBytes(8000, 1, 16, new Array[Byte](32))))
        .toDS().toDF().coalesce(1) // ONE file -> one trigger
        .write.mode("append").parquet(dir.resolve("in").toString)
      q.processAllAvailable()
    } finally q.stop()

    val hits = spark.table("audiodup_state")
      .select("doc_id", "orig_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((11L, 1L)), s"got $hits")
    // identical fingerprints collide on ALL 4 perceptual bands
    assert(spark.table("audiodup_state").where(col("doc_id") === 11L).count() == 4)
  }
}
