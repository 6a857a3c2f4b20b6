package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized roundtrip sweep for the container writers/parsers:
  * whatever the writers emit, the parsers must invert, across the full
  * parameter space — not just the doc_id-derived values the q71/q75
  * synthesis happens to hit. */
class ContainerRoundtripSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0xC0FFEE)

  test("WAV roundtrip holds across 200 random (rate, channels, bits, size) combos") {
    for (_ <- 1 to 200) {
      val rate = 1 + rng.nextInt(192000)
      val ch = Seq(1, 2, 4, 8)(rng.nextInt(4))
      val bits = Seq(8, 16, 24, 32)(rng.nextInt(4))
      val frame = ch * bits / 8
      val nFrames = rng.nextInt(500)
      val data = new Array[Byte](frame * nFrames)
      rng.nextBytes(data)
      val parsed = Multimodal.audioHeader(Multimodal.wavBytes(rate, ch, bits, data))
      assert(parsed === Some((rate.toLong, ch.toLong, bits.toLong, nFrames.toLong)),
        s"rate=$rate ch=$ch bits=$bits frames=$nFrames")
    }
  }

  test("MP4 roundtrip holds across 200 random (timescale, duration, size) combos") {
    for (_ <- 1 to 200) {
      val timescale = 1 + rng.nextInt(1000000)
      val duration = rng.nextLong(0xffffffffL) // full u32 range (mvhd v0)
      val data = new Array[Byte](rng.nextInt(4096))
      rng.nextBytes(data)
      val parsed = Multimodal.videoHeader(Multimodal.mp4Bytes(timescale, duration, data))
      assert(parsed === Some((timescale.toLong, duration, data.length.toLong)),
        s"timescale=$timescale duration=$duration n=${data.length}")
    }
  }

  test("parsers never crash on arbitrary byte garbage (they reject or clamp)") {
    for (n <- Seq(0, 1, 7, 8, 12, 44, 100, 1000)) {
      for (_ <- 1 to 50) {
        val junk = new Array[Byte](n)
        rng.nextBytes(junk)
        Multimodal.audioHeader(junk) // must return, never throw/hang
        Multimodal.videoHeader(junk)
        Multimodal.imageHeader(junk)
      }
    }
  }

  test("parsers never crash on corrupted valid containers") {
    val wav = Multimodal.wavBytes(44100, 2, 16, Array.fill[Byte](256)(7))
    val mp4 = Multimodal.mp4Bytes(600, 1234L, Array.fill[Byte](256)(7))
    for (base <- Seq(wav, mp4); _ <- 1 to 200) {
      val corrupted = base.clone()
      corrupted(rng.nextInt(corrupted.length)) = rng.nextInt(256).toByte
      Multimodal.audioHeader(corrupted)
      Multimodal.videoHeader(corrupted)
    }
  }
}
