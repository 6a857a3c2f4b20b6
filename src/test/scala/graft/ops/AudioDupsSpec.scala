package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The perceptual audio rung's contracts (q134): (1) the PCM decoder
  * round-trips [[Multimodal.wavBytes]] samples exactly and is total on
  * garbage; (2) the energy-gradient fingerprint is EXACTLY invariant
  * under positive gain scaling — the re-mastered-duplicate model — and
  * under frame-width changes that preserve per-frame amplitudes;
  * (3) exact payload hashing (q116's rung) provably misses the
  * gain-scaled copy this rung pairs; (4) the gate query surfaces
  * planted cross-gain pairs in the documents corpus. */
class AudioDupsSpec extends AnyFunSuite {

  private def toneData(amps: Array[Int], gain: Int, spf: Int): Array[Byte] = {
    val data = new Array[Byte](amps.length * spf * 2)
    for (f <- amps.indices; s <- 0 until spf) {
      val v = amps(f) * gain
      val off = (f * spf + s) * 2
      data(off) = (v & 0xff).toByte
      data(off + 1) = ((v >> 8) & 0xff).toByte
    }
    data
  }

  test("pcmSamples round-trips wavBytes exactly, including negative samples") {
    val rng = new Random(5)
    val vals = Array.fill(256)(rng.nextInt(65536) - 32768)
    val data = new Array[Byte](512)
    for (i <- vals.indices) {
      data(2 * i) = (vals(i) & 0xff).toByte
      data(2 * i + 1) = ((vals(i) >> 8) & 0xff).toByte
    }
    val (rate, ch, samples) =
      Multimodal.pcmSamples(Multimodal.wavBytes(16000, 1, 16, data)).get
    assert(rate == 16000 && ch == 1)
    assert(samples.toSeq == vals.toSeq, "sample round trip must be exact")
  }

  test("pcmSamples is total on garbage and rejects non-16-bit payloads") {
    val rng = new Random(9)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      Multimodal.pcmSamples(junk) // must not throw
    }
    val good = Multimodal.wavBytes(8000, 1, 16, new Array[Byte](64))
    for (cut <- 1 until good.length) Multimodal.pcmSamples(good.take(cut))
    assert(Multimodal.pcmSamples(Multimodal.wavBytes(8000, 1, 8,
      new Array[Byte](64))).isEmpty, "8-bit PCM must answer None, not mis-scale")
  }

  test("the fingerprint is exactly gain- and frame-width-invariant") {
    val rng = new Random(21)
    val amps = Array.fill(64)(rng.nextInt(256))
    val base = Multimodal.audioFingerprint(
      Multimodal.pcmSamples(Multimodal.wavBytes(8000, 1, 16,
        toneData(amps, 1, 16))).get._3).get
    for (gain <- Seq(2, 3, 7); spf <- Seq(8, 16, 32)) {
      val other = Multimodal.audioFingerprint(
        Multimodal.pcmSamples(Multimodal.wavBytes(16000, 1, 16,
          toneData(amps, gain, spf))).get._3).get
      assert(other == base, s"fingerprint moved under gain=$gain spf=$spf")
    }
    // falsifiability: a different amplitude ORDER moves the fingerprint
    val shuffled = amps.reverse
    val moved = Multimodal.audioFingerprint(
      Multimodal.pcmSamples(Multimodal.wavBytes(8000, 1, 16,
        toneData(shuffled, 1, 16))).get._3).get
    assert(moved != base, "reversed frame order must change the fingerprint")
  }

  test("a gain-scaled copy: exact payload hashing misses it, q134's rung pairs it") {
    val rng = new Random(33)
    val amps = Array.fill(64)(rng.nextInt(256))
    val a = Multimodal.wavBytes(8000, 1, 16, toneData(amps, 1, 16))
    val b = Multimodal.wavBytes(8000, 1, 16, toneData(amps, 3, 16))
    assert(!java.util.Arrays.equals(a, b), "the gain re-master changes the bytes")
    // q116's exact rung: payload hashes differ, so it can never pair them
    assert(!java.util.Arrays.equals(
      java.security.MessageDigest.getInstance("MD5").digest(a),
      java.security.MessageDigest.getInstance("MD5").digest(b)))
    val fa = Multimodal.audioFingerprint(Multimodal.pcmSamples(a).get._3).get
    val fb = Multimodal.audioFingerprint(Multimodal.pcmSamples(b).get._3).get
    assert(fa == fb, "the energy-gradient fingerprint must pair the gain-scaled copy")
  }

  test("q134 pairs planted cross-gain duplicates in the documents corpus") {
    import TestSpark.spark.implicits._
    val out = Multimodal.perceptualAudioDups(TestSpark.spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty, "q134 found no pairs at sf0.001")
    assert(out.forall(_._3 <= 3))
    // gain classes are doc_id mod 4: a cross-class pair is precisely the
    // gain-scaled re-encode q116 is blind to
    assert(out.exists(p => p._1 % 4 != p._2 % 4),
      s"no cross-gain pair surfaced among ${out.size} pairs")
  }
}
