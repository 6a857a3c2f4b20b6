package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The GIF codec's contracts, in the order q132 relies on them:
  * (1) GIF is lossless — every pixel array round-trips exactly under
  * every knob combination (unlike JPEG there is no quant-divisibility
  * caveat, so the oracle transfer argument is unconditional); (2) the
  * encoder knobs (sub-block size, periodic LZW clear, interlace,
  * comment) change bytes without changing decoded pixels; (3) the
  * decoder is total on garbage/truncations/foreign payloads and
  * rejects hostile declared dimensions before allocating; (4) the
  * format router makes a GIF re-encode visible to the perceptual rung
  * that PNG/JPEG-only families miss. */
class GifSpec extends AnyFunSuite {

  private def solidTiles(rng: Random, w: Int, h: Int): Array[Int] = {
    val bw = w / 8
    val tiles = Array.fill((w / 8) * (h / 8))(rng.nextInt(256))
    Array.tabulate(w * h)(p => tiles((p / w / 8) * bw + (p % w) / 8))
  }

  test("any pixels round-trip exactly under every knob combination") {
    val rng = new Random(42)
    for {
      chunk <- Seq(1, 64, 255)
      clearEvery <- Seq(0, 7, 200)
      interlace <- Seq(false, true)
      comment <- Seq("", "re-encoded")
    } {
      // GENERAL pixels, not just the solid-tile class: losslessness is
      // unconditional
      val px = Array.fill(32 * 16)(rng.nextInt(256))
      val gif = Gif.gifBytes(32, 16, px, chunk, clearEvery, interlace, comment)
      val decoded = Gif.decode(gif)
      assert(decoded.isDefined,
        s"chunk=$chunk clear=$clearEvery il=$interlace failed to decode")
      val (w, h, gray) = decoded.get
      assert((w, h) == (32, 16))
      assert(gray.toSeq == px.toSeq,
        s"pixel mismatch at chunk=$chunk clear=$clearEvery il=$interlace")
    }
    // the q132 shape (64x64) and odd heights (interlace pass edges)
    val big = Array.fill(64 * 64)(rng.nextInt(256))
    assert(Gif.decode(Gif.gifBytes(64, 64, big, interlace = true)).get._3.toSeq
      == big.toSeq)
    for (h <- Seq(1, 2, 3, 5, 9)) {
      val px = Array.fill(8 * h)(rng.nextInt(256))
      assert(Gif.decode(Gif.gifBytes(8, h, px, interlace = true)).get._3.toSeq
        == px.toSeq, s"interlace failed at height $h")
    }
  }

  test("a dictionary-heavy image exercises the 9->10->11->12-bit widths") {
    // pathological for LZW: no two adjacent pixels repeat a phrase
    // early, so the dictionary grows past every width bump; with
    // clearEvery=0 the encoder also exercises the dict-full clear
    val px = Array.tabulate(64 * 64)(i => (i * 37 + (i / 64) * 11) % 256)
    val gif = Gif.gifBytes(64, 64, px)
    assert(Gif.decode(gif).get._3.toSeq == px.toSeq)
  }

  test("same pixels, different knobs: different bytes, identical decode") {
    val rng = new Random(11)
    val px = solidTiles(rng, 64, 64)
    val a = Gif.gifBytes(64, 64, px, chunk = 255, clearEvery = 0)
    val b = Gif.gifBytes(64, 64, px, chunk = 64, clearEvery = 200,
      interlace = true, comment = "second pass")
    assert(!java.util.Arrays.equals(a, b), "re-encode must change the bytes")
    assert(Gif.decode(a).get._3.toSeq == Gif.decode(b).get._3.toSeq)
  }

  test("decode is total: garbage, truncations, and foreign formats answer None") {
    val rng = new Random(13)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      Gif.decode(junk) // must not throw regardless of outcome
    }
    val px = solidTiles(rng, 16, 16)
    val good = Gif.gifBytes(16, 16, px, comment = "x")
    // cuts inside the header/palette/descriptor must answer None; cuts
    // inside the data stream may answer None or a prefix-complete image,
    // but must never throw
    for (cut <- Seq(1, 5, 13, 100, 700))
      assert(Gif.decode(good.take(cut)).isEmpty, s"truncation at $cut must not decode")
    for (cut <- 1 until good.length) Gif.decode(good.take(cut))
    for (_ <- 1 to 200) {
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Gif.decode(mut)
    }
    val png = Multimodal.pngBytes(16, 16, px)
    assert(Gif.decode(png).isEmpty, "a PNG payload is not a GIF")
    assert(Multimodal.pngDecode(good).isEmpty && Jpeg.decode(good).isEmpty,
      "the other decoders must reject a GIF")
  }

  test("hostile declared dimensions are rejected before allocation") {
    val rng = new Random(29)
    val good = Gif.gifBytes(16, 16, solidTiles(rng, 16, 16))
    val huge = good.clone()
    // logical screen w/h at 6/8 LE and image descriptor w/h must agree,
    // so patch both (descriptor starts right after the 13-byte header +
    // 768-byte palette: 0x2c, left, top, w at +5, h at +7)
    def le16(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v & 0xff).toByte; a(off + 1) = ((v >> 8) & 0xff).toByte
    }
    le16(huge, 6, 40000); le16(huge, 8, 40000)
    val desc = 13 + 768
    assert(huge(desc) == 0x2c, "fixture assumption: descriptor after GCT")
    le16(huge, desc + 5, 40000); le16(huge, desc + 7, 40000)
    assert(Gif.decode(huge).isEmpty, "40000x40000 must be rejected, not allocated")
  }

  test("a GIF re-encode: PNG/JPEG-blind families miss it, the router catches it") {
    import TestSpark.spark.implicits._
    val rng = new Random(23)
    val tiles = Array.fill(64)(rng.nextInt(256))
    val px = Array.tabulate(64 * 64)(p => tiles((p / 64 / 8) * 8 + (p % 64) / 8))
    val other = Array.fill(64 * 64)(rng.nextInt(256))
    val media = Seq(
      MediaRecord(1L, Multimodal.pngBytes(64, 64, px, filterType = 2, level = 6)),
      MediaRecord(2L, Jpeg.jpegBytes(64, 64, px, dcQuant = 4, acQuant = 20)),
      MediaRecord(3L, Gif.gifBytes(64, 64, px, chunk = 64, interlace = true,
        comment = "forum re-upload")),
      MediaRecord(4L, Gif.gifBytes(64, 64, other))).toDS()
    val pngOnly = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000, decoder = Multimodal.pngDecode)
      .as[(Long, Long, Long)].collect().toSeq
    val routed = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000)
      .as[(Long, Long, Long)].collect().toSet
    assert(pngOnly.isEmpty,
      s"the PNG-only family must be blind to the JPEG and GIF copies: $pngOnly")
    assert(routed == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)),
      s"the router must pair all three containers at hamming 0: $routed")
  }

  test("q132 pairs planted GIF-side duplicates in the documents corpus") {
    import TestSpark.spark.implicits._
    val out = Multimodal.crossFormatTrioDups(TestSpark.spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty, "q132 found no pairs at sf0.001")
    assert(out.forall(_._3 <= 3))
    assert(out.exists(p => p._1 % 3 == 2 || p._2 % 3 == 2),
      s"no pair with a GIF member surfaced among ${out.size} pairs")
    assert(out.exists(p => (p._1 % 3 == 2) != (p._2 % 3 == 2)),
      s"no GIF<->other-container pair surfaced among ${out.size} pairs")
  }
}
