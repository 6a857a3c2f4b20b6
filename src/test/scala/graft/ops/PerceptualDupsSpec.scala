package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q121 falsifiability — the claim the perceptual rung exists to make
  * true: a RE-ENCODED duplicate image (same pixels, different bytes via
  * filter/compression/chunking choices) and a cleanly RESIZED duplicate
  * are invisible to exact payload hashing (the q116 rung) but must land
  * in one aHash bucket and pair under q121. Plus the codec's own
  * contract: encode→decode is an identity on pixels for every filter
  * type, compression level, and IDAT chunking. */
class PerceptualDupsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def randPixels(rng: Random, n: Int): Array[Int] =
    Array.fill(n)(rng.nextInt(256))

  test("PNG encode -> decode round-trips pixels for every filter/level/chunking") {
    val rng = new Random(42)
    for {
      filter <- 0 to 4
      level <- Seq(1, 6, 9)
      chunk <- Seq(Int.MaxValue, 64, 7)
    } {
      val px = randPixels(rng, 16 * 16)
      val png = Multimodal.pngBytes(16, 16, px, filter, level, chunk)
      val decoded = Multimodal.pngDecode(png)
      assert(decoded.isDefined, s"filter=$filter level=$level chunk=$chunk failed to decode")
      val (w, h, gray) = decoded.get
      assert((w, h) == (16, 16))
      assert(gray.toSeq == px.toSeq, s"pixel mismatch at filter=$filter level=$level chunk=$chunk")
    }
    // non-square and larger dims too (the resize case depends on them)
    val px = randPixels(rng, 32 * 16)
    val (w, h, gray) = Multimodal.pngDecode(Multimodal.pngBytes(32, 16, px, 4, 9, 11)).get
    assert((w, h) == (32, 16) && gray.toSeq == px.toSeq)
  }

  test("a re-encoded duplicate: different bytes, identical aHash") {
    val rng = new Random(7)
    val px = randPixels(rng, 16 * 16)
    val a = Multimodal.pngBytes(16, 16, px, filterType = 0, level = 9)
    val b = Multimodal.pngBytes(16, 16, px, filterType = 4, level = 1, chunk = 32)
    assert(!java.util.Arrays.equals(a, b), "re-encode must change the bytes")
    // ...so any exact-payload hash (the q116 rung) sees two distinct blobs
    assert(Multimodal.aHash64(Multimodal.pngDecode(a).get._3, 16, 16) ==
      Multimodal.aHash64(Multimodal.pngDecode(b).get._3, 16, 16))
  }

  test("a clean 2x upscale block-averages to the same aHash") {
    val rng = new Random(11)
    val px = randPixels(rng, 16 * 16)
    val up = new Array[Int](32 * 32)
    for (r <- 0 until 32; c <- 0 until 32) up(r * 32 + c) = px(r / 2 * 16 + c / 2)
    assert(Multimodal.aHash64(px, 16, 16) == Multimodal.aHash64(up, 32, 32))
  }

  test("q121 pairs the planted re-encode and resize; exact hashing misses both") {
    import spark.implicits._
    val rng = new Random(3)
    val px = randPixels(rng, 16 * 16)
    val up = new Array[Int](32 * 32)
    for (r <- 0 until 32; c <- 0 until 32) up(r * 32 + c) = px(r / 2 * 16 + c / 2)
    val other = randPixels(rng, 16 * 16)
    val media = Seq(
      MediaRecord(1L, Multimodal.pngBytes(16, 16, px, filterType = 0, level = 9)),
      MediaRecord(2L, Multimodal.pngBytes(16, 16, px, filterType = 4, level = 1, chunk = 32)),
      MediaRecord(3L, Multimodal.pngBytes(32, 32, up, filterType = 2, level = 6)),
      MediaRecord(4L, Multimodal.pngBytes(16, 16, other, filterType = 1, level = 6)),
      MediaRecord(5L, "not a png at all".getBytes("UTF-8"))).toDS()
    // exact payload hashes: all five blobs distinct — the q116 rung pairs nothing
    assert(media.collect().map(r => java.util.Arrays.hashCode(r.payload)).distinct.length == 5)
    val out = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
        maxBandPopulation = 1000)
      .as[(Long, Long, Long)].collect().toSeq
    // the re-encode (1,2) and both resize pairings (1,3)/(2,3) surface at
    // hamming 0; the unrelated image and the non-PNG payload pair nothing
    assert(out == Seq((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)), s"got $out")
  }

  test("a gamma-mapped duplicate: dHash (q125) catches what aHash (q121) misses") {
    import spark.implicits._
    // a monotonic tone curve (gamma ~2) preserves the ORDER of block
    // values whenever blocks are tonally uniform (avg of a monotone map
    // equals the map of the avg only then — Jensen breaks the exact
    // claim for mixed blocks), so the fixture tiles each 2×2 block with
    // one value: dHash (adjacent-block order) is then invariant EXACTLY,
    // while aHash's block-vs-global-mean bits flip (the mean is not
    // order-preserved through the nonlinearity). The fixture is a
    // deterministic search for the first seed whose gamma copy lands
    // outside q121's hamming radius (seed search, not luck: both the
    // search and its result are fixed forever)
    def ham(x: (Long, Long), y: (Long, Long)): Int =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    def toneCurve(p: Array[Int]): Array[Int] = p.map(v => (v.toLong * v / 255).toInt)
    def solidBlocks(seed: Int): Array[Int] = {
      val rng = new Random(seed)
      val blocks = Array.fill(64)(rng.nextInt(256))
      Array.tabulate(256)(i => blocks((i / 16 / 2) * 8 + (i % 16) / 2))
    }
    val px = (1 to 200).iterator
      .map(solidBlocks)
      .find(p => ham(Multimodal.aHash64(p, 16, 16),
        Multimodal.aHash64(toneCurve(p), 16, 16)) > 3)
      .getOrElse(fail("no seed in 1..200 flips > 3 aHash bits under gamma"))
    val gamma = toneCurve(px)
    assert(Multimodal.dHash64(px, 16, 16) == Multimodal.dHash64(gamma, 16, 16),
      "a monotonic tone map must leave dHash bit-identical")

    val media = Seq(
      MediaRecord(1L, Multimodal.pngBytes(16, 16, px, filterType = 0, level = 9)),
      MediaRecord(2L, Multimodal.pngBytes(16, 16, gamma, filterType = 4, level = 1)),
      MediaRecord(3L, Multimodal.pngBytes(16, 16, randPixels(new Random(999), 256),
        filterType = 1))).toDS()
    val viaAHash = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000).as[(Long, Long, Long)].collect().toSeq
    val viaDHash = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000, Multimodal.dHash64).as[(Long, Long, Long)].collect().toSeq
    assert(viaAHash.isEmpty, s"aHash should miss the tone-mapped pair: $viaAHash")
    assert(viaDHash == Seq((1L, 2L, 0L)), s"dHash must catch it at hamming 0: $viaDHash")
  }

  test("the hot-band cap drops a mass-duplicated image whole") {
    import spark.implicits._
    val rng = new Random(5)
    val logo = randPixels(rng, 16 * 16)
    // 6 byte-different encodes of one logo + 2 of a distinct image
    val media = ((1L to 6L).map(i =>
      MediaRecord(i, Multimodal.pngBytes(16, 16, logo, (i % 5).toInt, (i % 9).toInt + 1))) ++
      Seq(7L, 8L).map { i =>
        val px = randPixels(new Random(99), 16 * 16)
        MediaRecord(i, Multimodal.pngBytes(16, 16, px, (i % 5).toInt, 6))
      }).toDS()
    val out = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
        maxBandPopulation = 5)
      .as[(Long, Long, Long)].collect().toSeq
    // the logo's 6 copies exceed the cap in every band -> dropped whole;
    // the pair of distinct-image copies (7,8) still surfaces
    assert(out == Seq((7L, 8L, 0L)), s"got $out")
  }

  test("a PNG->JPEG re-encode: the PNG-only family misses it, the format router catches it") {
    import spark.implicits._
    // same pixels, two containers — the commonest wild duplicate. The
    // pixels are the q126 solid-tile class, so the JPEG round trip is
    // exact and the pair lands at hamming 0.
    val rng = new Random(23)
    val tiles = Array.fill(64)(rng.nextInt(256))
    val px = Array.tabulate(64 * 64)(p => tiles((p / 64 / 8) * 8 + (p % 64) / 8))
    val other = Array.fill(64 * 64)(rng.nextInt(256))
    val media = Seq(
      MediaRecord(1L, Multimodal.pngBytes(64, 64, px, filterType = 2, level = 6)),
      MediaRecord(2L, Jpeg.jpegBytes(64, 64, px, dcQuant = 4, acQuant = 20,
        restartInterval = 2, comment = "social-media re-encode")),
      MediaRecord(3L, Multimodal.pngBytes(64, 64, other, filterType = 1))).toDS()
    val pngOnly = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000, decoder = Multimodal.pngDecode)
      .as[(Long, Long, Long)].collect().toSeq
    val routed = Multimodal.perceptualDupsOfPayloads(media, maxHamming = 3,
      maxBandPopulation = 1000)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pngOnly.isEmpty,
      s"the PNG-only family must be blind to the JPEG copy: $pngOnly")
    assert(routed == Seq((1L, 2L, 0L)), s"the router must catch it at hamming 0: $routed")
  }

  test("q126 pairs planted cross-format duplicates in the documents corpus") {
    import spark.implicits._
    // Drive the real q126 entry at sf0.001 and check the invariant the
    // oracle enforces end-to-end: every returned pair has identical
    // decoded hashes within the radius, and pairs EXIST in both
    // even-even and mixed parities at this corpus (duplicate texts are
    // planted in the testdata generator across id parities)
    val out = Multimodal.crossFormatDups(TestSpark.spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty, "q126 found no pairs at sf0.001")
    assert(out.forall(_._3 <= 3))
    assert(out.exists(p => (p._1 - p._2) % 2 != 0),
      s"no cross-parity (PNG vs JPEG) pair surfaced among ${out.size} pairs")
  }
}
