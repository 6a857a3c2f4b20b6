package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the real image-header decode (PNG/JPEG/GIF magic + dimensions)
  * and the stub fallback for non-media payloads. */
class MultimodalSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private val png640x480rgba: Array[Byte] = bytes(
    0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
    0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',  // IHDR chunk header
    0x00, 0x00, 0x02, 0x80,                      // width 640
    0x00, 0x00, 0x01, 0xe0,                      // height 480
    0x08, 0x06)                                  // bit depth 8, color type 6 (RGBA)

  private val gif320x200: Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ bytes(0x40, 0x01, 0xc8, 0x00) // LE 320 x 200

  private val jpeg640x480: Array[Byte] = bytes(
    0xff, 0xd8,             // SOI
    0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4
    0xff, 0xc0, 0x00, 0x11, // SOF0, len 17
    0x08,                   // precision
    0x01, 0xe0,             // height 480
    0x02, 0x80,             // width 640
    0x03) ++ Array.fill[Byte](12)(0) // 3 components + segment padding

  test("PNG header: dimensions and channels from IHDR") {
    assert(Multimodal.imageHeader(png640x480rgba) === Some((640L, 480L, 4L)))
    val m = Multimodal.decodeMeta(7L, png640x480rgba)
    assert((m.width, m.height, m.channels) === (640L, 480L, 4L))
    assert((m.resized_w, m.resized_h) === (224L, 168L)) // aspect-preserving fit
  }

  test("GIF header: little-endian logical screen size") {
    assert(Multimodal.imageHeader(gif320x200) === Some((320L, 200L, 3L)))
  }

  test("JPEG header: SOFn frame dimensions after marker walk") {
    assert(Multimodal.imageHeader(jpeg640x480) === Some((640L, 480L, 3L)))
  }

  test("WAV writer -> parser roundtrip across rates/channels") {
    for ((rate, ch) <- Seq((8000, 1), (16000, 2), (44100, 2), (12000, 1))) {
      val data = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
      val wav = Multimodal.wavBytes(rate, ch, 16, data)
      assert(Multimodal.audioHeader(wav) ===
        Some((rate.toLong, ch.toLong, 16L, (4096 / (ch * 2)).toLong)),
        s"rate=$rate ch=$ch")
    }
  }

  test("WAV chunk walk skips LIST chunks between fmt and data") {
    val data = Array.fill[Byte](400)(1)
    val plain = Multimodal.wavBytes(16000, 1, 16, data)
    // splice a 10-byte LIST chunk (odd size -> exercises word alignment)
    // between fmt (ends at offset 36) and data
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](9, 0, 0, 0) ++ Array.fill[Byte](9 + 1)(0x20)
    val spliced = plain.take(36) ++ list ++ plain.drop(36)
    // RIFF size field is now stale, but the parser walks chunks, not the
    // outer size
    assert(Multimodal.audioHeader(spliced) === Some((16000L, 1L, 16L, 200L)))
  }

  test("WAV parser clamps a data size field larger than the payload") {
    val wav = Multimodal.wavBytes(8000, 1, 16, Array.fill[Byte](100)(0))
    val truncated = wav.take(wav.length - 20) // 80 data bytes remain
    assert(Multimodal.audioHeader(truncated) === Some((8000L, 1L, 16L, 40L)))
  }

  test("WAV parser rejects a zero-size fmt chunk (fields would read from the next chunk)") {
    val wav = Multimodal.wavBytes(16000, 1, 16, Array.fill[Byte](100)(0))
    // zero out the fmt chunk's size field (offset 16): a parser reading
    // fields at fixed offsets regardless would see the data chunk's bytes
    (16 until 20).foreach(i => wav(i) = 0)
    assert(Multimodal.audioHeader(wav) === None)
  }

  test("WAV parser terminates on a hostile 0xFFFFFFFF chunk size") {
    val wav = Multimodal.wavBytes(8000, 1, 16, Array.fill[Byte](40)(0))
    // corrupt the data chunk's size field (offset 40) to u32 max
    (40 until 44).foreach(i => wav(i) = 0xff.toByte)
    // data length clamps to the remaining payload; the walk must not hang
    assert(Multimodal.audioHeader(wav) === Some((8000L, 1L, 16L, 20L)))
  }

  test("non-WAV payloads are rejected") {
    assert(Multimodal.audioHeader("not audio at all, just a plain string payload".getBytes) === None)
    assert(Multimodal.audioHeader(png640x480rgba) === None)
    assert(Multimodal.audioHeader(Array.emptyByteArray) === None)
  }

  test("MP4 writer -> box-walk parser roundtrip") {
    val data = Array.fill[Byte](1000)(3)
    val mp4 = Multimodal.mp4Bytes(timescale = 900, duration = 12345L, data)
    assert(Multimodal.videoHeader(mp4) === Some((900L, 12345L, 1000L)))
  }

  test("MP4 parser reads a version-1 mvhd (64-bit duration) and sums multiple mdat boxes") {
    // hand-build: ftyp + moov(mvhd v1) + two mdat boxes
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 8 + 112 + (8 + 5) + (8 + 7))
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16); bb.put("ftypisom".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(8 + 8 + 112); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(8 + 112); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0x01000000) // version 1
    bb.putLong(0); bb.putLong(0) // creation, modification (u64 in v1)
    bb.putInt(48000) // timescale
    bb.putLong(5000000000L) // duration > u32
    bb.put(Array.fill[Byte](112 - 4 - 8 - 8 - 4 - 8)(0)) // rest of mvhd
    bb.putInt(8 + 5); bb.put("mdat".getBytes("US-ASCII")); bb.put(Array.fill[Byte](5)(1))
    bb.putInt(8 + 7); bb.put("mdat".getBytes("US-ASCII")); bb.put(Array.fill[Byte](7)(2))
    assert(Multimodal.videoHeader(bb.array()) === Some((48000L, 5000000000L, 12L)))
  }

  test("MP4 parser rejects a version-1 mvhd too short for its u64 duration") {
    // ftyp + moov whose mvhd claims v1 but is only 32 bytes (the v0
    // minimum): the u64 duration read would run past the buffer
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 32)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16); bb.put("ftypisom".getBytes("US-ASCII")); bb.putInt(0)
    bb.putInt(8 + 32); bb.put("moov".getBytes("US-ASCII"))
    bb.putInt(32); bb.put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0x01000000) // version 1
    bb.put(Array.fill[Byte](32 - 8 - 4)(0))
    assert(Multimodal.videoHeader(bb.array()) === None)
  }

  test("non-MP4 and malformed boxes are rejected") {
    assert(Multimodal.videoHeader("plain text payload, definitely not a container".getBytes) === None)
    val good = Multimodal.mp4Bytes(600, 100L, Array.fill[Byte](10)(0))
    assert(Multimodal.videoHeader(good.take(20)) === None) // truncated mid-box
  }

  test("non-media payloads fall back to the stub (q40 oracle contract)") {
    val text = "An ordinary document that is not an image.".getBytes("UTF-8")
    assert(Multimodal.imageHeader(text) === None)
    assert(Multimodal.decodeMeta(3L, text) === Multimodal.stubDecode(text).copy(doc_id = 3L))
    // truncated magic prefixes must not crash or match
    assert(Multimodal.imageHeader(bytes(0x89, 'P')) === None)
    assert(Multimodal.imageHeader(bytes(0xff, 0xd8, 0xff)) === None)
    assert(Multimodal.imageHeader(Array.emptyByteArray) === None)
  }

  test("decode pipeline carries real headers through the typed Dataset") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ds = Seq(MediaRecord(1L, png640x480rgba), MediaRecord(2L, gif320x200),
      MediaRecord(3L, "plain text".getBytes("UTF-8"))).toDS()
    val out = ds.mapPartitions(_.map(r => Multimodal.decodeMeta(r.doc_id, r.payload)))
      .collect().map(m => m.doc_id -> (m.width, m.height, m.channels)).toMap
    assert(out(1L) === ((640L, 480L, 4L)))
    assert(out(2L) === ((320L, 200L, 3L)))
    assert(out(3L)._1 === "plain text".length % 640) // stub path
  }
}
