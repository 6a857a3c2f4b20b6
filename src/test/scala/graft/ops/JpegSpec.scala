package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The baseline-JFIF codec's contracts, in the order q126 relies on
  * them: (1) the solid-tile class round-trips EXACTLY whenever the DC
  * quant step divides 8·(v−128) — this is what lets a DuckDB oracle
  * predict hashes through a lossy codec; (2) general pixels round-trip
  * within a small bounded error at unit quant (the codec is a real
  * DCT codec, not a fake); (3) encoder knobs change bytes without
  * changing decoded pixels (the re-encoded-duplicate model); (4) the
  * decoder answers None, never throws, on garbage — the scan-phase
  * contract for crawled payloads. */
class JpegSpec extends AnyFunSuite {

  private def solidTiles(rng: Random, w: Int, h: Int): Array[Int] = {
    val bw = w / 8
    val tiles = Array.fill((w / 8) * (h / 8))(rng.nextInt(256))
    Array.tabulate(w * h)(p => tiles((p / w / 8) * bw + (p % w) / 8))
  }

  test("solid 8x8 tiles round-trip exactly for every dcQuant in {1,2,4,8} and knob combo") {
    val rng = new Random(42)
    for {
      dcQuant <- Seq(1, 2, 4, 8)
      acQuant <- Seq(1, 16, 22, 255)
      restart <- Seq(0, 1, 3)
      comment <- Seq("", "re-encoded")
    } {
      val px = solidTiles(rng, 16, 16)
      val jpg = Jpeg.jpegBytes(16, 16, px, dcQuant, acQuant, restart, comment)
      val decoded = Jpeg.decode(jpg)
      assert(decoded.isDefined,
        s"dc=$dcQuant ac=$acQuant rst=$restart failed to decode")
      val (w, h, gray) = decoded.get
      assert((w, h) == (16, 16))
      assert(gray.toSeq == px.toSeq,
        s"pixel mismatch at dc=$dcQuant ac=$acQuant rst=$restart")
    }
    // the q126 shape: 64x64, 64 tiles — and a non-square case
    val big = solidTiles(rng, 64, 64)
    val (w1, h1, g1) = Jpeg.decode(Jpeg.jpegBytes(64, 64, big, dcQuant = 4)).get
    assert((w1, h1) == (64, 64) && g1.toSeq == big.toSeq)
    val rect = solidTiles(rng, 32, 16)
    val (w2, h2, g2) = Jpeg.decode(Jpeg.jpegBytes(32, 16, rect, restartInterval = 2)).get
    assert((w2, h2) == (32, 16) && g2.toSeq == rect.toSeq)
  }

  test("a dcQuant that does NOT divide 8 is genuinely lossy on solid tiles") {
    // falsifiability of the exactness argument: the identity is a
    // property of the chosen quant steps, not of the codec magically
    // being lossless. Quant steps ≤ 8 can never move a solid pixel
    // (pixel error ≤ q/16 < 0.5), so use q=16 with an ODD v−128:
    // DC = 8·(v−128) ≡ 8 (mod 16) is an exact quantization tie,
    // HALF_UP rounds it a full pixel away.
    val px = Array.fill(16 * 16)(129) // DC 8 -> round(0.5)*16 = 16 -> pixel 130
    val (_, _, gray) = Jpeg.decode(Jpeg.jpegBytes(16, 16, px, dcQuant = 16)).get
    assert(gray.toSeq != px.toSeq,
      "a 16-step DC quant must perturb an odd-offset solid value")
    assert(gray.forall(v => math.abs(v - 129) <= 1), "but only by one step")
  }

  test("general pixels round-trip within ±2 at unit quant") {
    val rng = new Random(7)
    val px = Array.fill(16 * 16)(rng.nextInt(256))
    val (_, _, gray) = Jpeg.decode(Jpeg.jpegBytes(16, 16, px, dcQuant = 1, acQuant = 1)).get
    val maxErr = px.indices.map(i => math.abs(gray(i) - px(i))).max
    assert(maxErr <= 2, s"unit-quant round trip drifted by $maxErr")
  }

  test("same pixels, different knobs: different bytes, identical decode") {
    val rng = new Random(11)
    val px = solidTiles(rng, 64, 64)
    val a = Jpeg.jpegBytes(64, 64, px, dcQuant = 8, acQuant = 16)
    val b = Jpeg.jpegBytes(64, 64, px, dcQuant = 1, acQuant = 22,
      restartInterval = 2, comment = "second pass")
    assert(!java.util.Arrays.equals(a, b), "re-encode must change the bytes")
    assert(Jpeg.decode(a).get._3.toSeq == Jpeg.decode(b).get._3.toSeq)
  }

  test("decode is total: garbage, truncations, and foreign formats answer None") {
    val rng = new Random(13)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      assert(Jpeg.decode(junk).isEmpty || junk.length >= 2) // tiny arrays must not throw
      Jpeg.decode(junk) // must not throw regardless of outcome
    }
    val good = Jpeg.jpegBytes(16, 16, solidTiles(rng, 16, 16))
    // cuts inside the marker headers (SOI..SOS spans ~310 bytes: APP0 +
    // DQT + the 212-byte Annex K DHT) must answer None; cuts inside the
    // entropy tail may legitimately still decode (a stream truncated
    // after its last MCU but before EOI is complete), so there we only
    // require totality
    for (cut <- Seq(1, 2, 10, 50, 150, 250))
      assert(Jpeg.decode(good.take(cut)).isEmpty, s"truncation at $cut must not decode")
    for (cut <- 1 until good.length) Jpeg.decode(good.take(cut)) // must not throw
    // flip bytes across the stream: decode must never throw
    for (_ <- 1 to 200) {
      val mut = good.clone()
      mut(rng.nextInt(mut.length)) = rng.nextInt(256).toByte
      Jpeg.decode(mut)
    }
    val png = Multimodal.pngBytes(16, 16, solidTiles(rng, 16, 16))
    assert(Jpeg.decode(png).isEmpty, "a PNG payload is not a JPEG")
  }

  test("hostile declared dimensions are rejected before allocation") {
    // A 2 KB payload declaring 40000x40000 would allocate ~6.4 GB of
    // pixels if dims were trusted; OutOfMemoryError is fatal (NonFatal
    // doesn't catch it), so the guard must fire BEFORE the allocation.
    val rng = new Random(29)
    val good = Jpeg.jpegBytes(16, 16, solidTiles(rng, 16, 16))
    val sof = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val huge = good.clone()
    // height at SOF+5, width at SOF+7, both big-endian u16; 40000 % 8 == 0
    huge(sof + 5) = (40000 >> 8).toByte; huge(sof + 6) = (40000 & 0xff).toByte
    huge(sof + 7) = (40000 >> 8).toByte; huge(sof + 8) = (40000 & 0xff).toByte
    assert(Jpeg.decode(huge).isEmpty, "40000x40000 must be rejected, not allocated")

    val pngGood = Multimodal.pngBytes(16, 16, solidTiles(rng, 16, 16))
    val pngHuge = pngGood.clone()
    // IHDR width is be32 at offset 16, height at 20 (CRC is not checked)
    pngHuge(16) = 0; pngHuge(17) = 0; pngHuge(18) = (40000 >> 8).toByte
    pngHuge(19) = (40000 & 0xff).toByte
    pngHuge(20) = 0; pngHuge(21) = 0; pngHuge(22) = (40000 >> 8).toByte
    pngHuge(23) = (40000 & 0xff).toByte
    assert(Multimodal.pngDecode(pngHuge).isEmpty,
      "hostile PNG dims must be rejected before the filter-buffer allocation")
  }

  test("imageDecode routes by magic bytes") {
    val rng = new Random(17)
    val px = solidTiles(rng, 16, 16)
    val png = Multimodal.pngBytes(16, 16, px)
    val jpg = Jpeg.jpegBytes(16, 16, px)
    assert(Multimodal.imageDecode(png).get._3.toSeq == px.toSeq)
    assert(Multimodal.imageDecode(jpg).get._3.toSeq == px.toSeq)
    assert(Multimodal.imageDecode("neither".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDecode(Array.emptyByteArray).isEmpty)
  }
}
