package graft.ops

import scala.util.control.NonFatal

/** Real GIF87a/89a grayscale codec — the third leg of the cross-format
  * perceptual family ([[Jpeg]] makes the argument for JPEG at its
  * header; the same argument holds here: a GIF re-encode of a PNG or
  * JPEG image is byte-unrelated to its source, so a dedup keyed on
  * payload hashes — or on per-format pixel hashes that cannot READ a
  * GIF — misses the commonest wild duplicate wearing this container).
  *
  * Encoder: logical screen + 256-entry gray global color table +
  * optional comment extension + one non-interlaced or interlaced image
  * with genuine LZW-compressed data (variable 9→12-bit codes, clear /
  * EOI handling, optional periodic clear — a real bitstream knob that
  * changes bytes without changing pixels, like PNG's filter/level and
  * JPEG's quant/restart knobs). GIF is LOSSLESS, so the q126 solid-tile
  * oracle rule transfers unchanged.
  *
  * Decoder: total — any byte array answers Some(pixels) or None, never
  * throws and never loops (every scan position strictly advances; the
  * LZW reader is bounded by the declared pixel count and the bitstream
  * length). Crawl-safe guards: declared-dimension cap before any
  * allocation (the [[Jpeg]] OutOfMemoryError hazard), palette-bounds
  * checks, KwKwK-only forward references, dictionary capped at 4096.
  * Layout and LZW semantics follow the public GIF89a specification
  * (CompuServe, 1990) — format knowledge only; the reference engine
  * (ddominici/csv-to-parquet, converter/converter.go) has no media
  * handling at all.
  */
object Gif {

  /** Encode 8-bit grayscale pixels as a real GIF. `chunk` = data
    * sub-block payload size (1..255); `clearEvery` > 0 emits an LZW
    * clear code every N dictionary adds (bitstream-varying, pixel-
    * preserving); `comment` adds a GIF89a comment extension. */
  def gifBytes(width: Int, height: Int, gray: Array[Int],
      chunk: Int = 255, clearEvery: Int = 0,
      interlace: Boolean = false, comment: String = ""): Array[Byte] = {
    require(gray.length == width * height, "pixel count must match dimensions")
    require(width > 0 && height > 0 && width <= 65535 && height <= 65535,
      "dimensions must fit u16")
    require(chunk > 0, "sub-block payload size must be positive")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write((if (comment.nonEmpty) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    le16(width); le16(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    if (comment.nonEmpty) {
      out.write(0x21); out.write(0xfe)
      val cb = comment.getBytes("UTF-8")
      var o = 0
      while (o < cb.length) {
        val n = math.min(255, cb.length - o)
        out.write(n); out.write(cb, o, n); o += n
      }
      out.write(0)
    }
    out.write(0x2c); le16(0); le16(0); le16(width); le16(height)
    out.write(if (interlace) 0x40 else 0x00)
    out.write(8) // LZW minimum code size (256-color palette)
    val rows = if (interlace) interlaceOrder(height) else Array.tabulate(height)(identity)
    val idx = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) { idx(r * width + c) = gray(rows(r) * width + c) & 0xff; c += 1 }
      r += 1
    }
    val lzw = lzwEncode(idx, minCode = 8, clearEvery = clearEvery)
    val cs = math.min(255, chunk)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(cs, lzw.length - o)
      out.write(n); out.write(lzw, o, n); o += n
    }
    out.write(0)    // data terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the FIRST image of a GIF stream to (width, height, gray
    * pixels); gray = integer luminance (77r + 150g + 29b) >> 8, which is
    * the identity on the gray palettes [[gifBytes]] writes. None for
    * anything malformed, truncated, foreign, oversized, or laid out
    * beyond the crawl-safe subset (the image must fill the logical
    * screen at offset 0,0 — tiled/animated compositions are a renderer
    * concern, not a dedup rung's). */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeInner(p) catch { case NonFatal(_) => None }

  private def decodeInner(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 14) return None
    if (!(p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
      (p(4) == '7' || p(4) == '9') && p(5) == 'a')) return None
    val sw = u16(6); val sh = u16(8)
    val packed = u8(10)
    var pos = 13
    def readPalette(sizeBits: Int): Array[Int] = {
      val n = 2 << (sizeBits & 7)
      if (pos + 3 * n > p.length) return null
      val pal = Array.tabulate(n)(j =>
        (77 * u8(pos + 3 * j) + 150 * u8(pos + 3 * j + 1) + 29 * u8(pos + 3 * j + 2)) >> 8)
      pos += 3 * n
      pal
    }
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      gct = readPalette(packed)
      if (gct == null) return None
    }
    while (pos < p.length) {
      u8(pos) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos += 2
          while ({ if (pos >= p.length) return None; u8(pos) != 0 }) pos += 1 + u8(pos)
          pos += 1
        case 0x2c =>
          if (pos + 10 > p.length) return None
          val left = u16(pos + 1); val top = u16(pos + 3)
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ip = u8(pos + 9)
          pos += 10
          val pal = if ((ip & 0x80) != 0) readPalette(ip) else gct
          if (pal == null) return None
          if (left != 0 || top != 0 || w != sw || h != sh) return None
          if (w <= 0 || h <= 0) return None
          // dimension cap BEFORE allocation — the Jpeg/pngDecode guard:
          // a tiny hostile payload declaring huge dims must not trigger
          // a fatal OutOfMemoryError
          if (w.toLong * h.toLong > (1L << 24)) return None
          if (pos >= p.length) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while ({ if (pos >= p.length) return None; u8(pos) != 0 }) {
            val n = u8(pos)
            if (pos + 1 + n > p.length) return None
            data.write(p, pos + 1, n); pos += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          if (idx == null) return None
          val gray = new Array[Int](w * h)
          val rows = if ((ip & 0x40) != 0) interlaceOrder(h)
          else Array.tabulate(h)(identity)
          var r = 0
          while (r < h) {
            var c = 0
            while (c < w) {
              val v = idx(r * w + c)
              if (v >= pal.length) return None
              gray(rows(r) * w + c) = pal(v)
              c += 1
            }
            r += 1
          }
          return Some((w, h, gray))
        case _ => return None
      }
    }
    None
  }

  /** GIF interlace pass order: stream row j holds actual row order(j)
    * (passes at strides 8/8/4/2 starting 0/4/2/1). */
  private def interlaceOrder(h: Int): Array[Int] = {
    val b = Array.newBuilder[Int]
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { b += r; r += step }
    }
    b.result()
  }

  /** GIF-variant LZW encode: 9..12-bit codes, LSB-first packing, clear
    * emitted up front, on dictionary-full, and every `clearEvery` adds.
    * The code-width bump mirrors the decoder's state machine one add
    * ahead (the encoder adds on EMIT, the decoder on the NEXT received
    * code), including the phantom add after the final data code so the
    * EOI width matches on both sides. */
  private def lzwEncode(indices: Array[Int], minCode: Int, clearEvery: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val clear = 1 << minCode; val eoi = clear + 1
    var codeSize = minCode + 1
    var next = eoi + 1
    var bitBuf = 0; var bitCnt = 0
    val dict = new java.util.HashMap[Integer, Integer]()
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) { out.write(bitBuf & 0xff); bitBuf >>>= 8; bitCnt -= 8 }
    }
    def reset(): Unit = { dict.clear(); next = eoi + 1; codeSize = minCode + 1 }
    emit(clear)
    var cur = indices(0)
    var adds = 0
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        dict.put(key, Integer.valueOf(next)); next += 1; adds += 1
        if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
        if (next == 4096 || (clearEvery > 0 && adds % clearEvery == 0)) {
          emit(clear); reset()
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    // the decoder adds an entry for this final code before reading EOI;
    // mirror its potential width bump or the EOI widths disagree
    next += 1
    if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
    emit(eoi)
    if (bitCnt > 0) out.write(bitBuf & 0xff)
    out.toByteArray
  }

  /** GIF-variant LZW decode of exactly `nPixels` indices; null on any
    * malformation (truncation, EOI-early, non-KwKwK forward reference,
    * first-code-not-root). Bounded: output is `nPixels`, the dictionary
    * 4096 entries, and every bit position strictly advances. */
  private def lzwDecode(d: Array[Byte], minCode: Int, nPixels: Int): Array[Int] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Int](4096)
    var next = eoi + 1; var codeSize = minCode + 1
    val out = new Array[Int](nPixels); var outN = 0
    var bitPos = 0
    val totalBits = d.length * 8
    def read(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0; var j = 0
      while (j < codeSize) {
        val b = bitPos + j
        if (((d(b >> 3) >> (b & 7)) & 1) != 0) v |= 1 << j
        j += 1
      }
      bitPos += codeSize
      v
    }
    val scratch = new Array[Int](4097)
    def firstOf(code: Int): Int = { var c = code; while (c >= clear) c = prefix(c); c }
    // expand `code` into out; false on overflow of the declared pixels
    def expand(code: Int): Boolean = {
      var n = 0; var c = code
      while (c >= clear) { scratch(n) = suffix(c); n += 1; c = prefix(c) }
      scratch(n) = c; n += 1
      if (outN + n > nPixels) return false
      var j = n - 1
      while (j >= 0) { out(outN) = scratch(j); outN += 1; j -= 1 }
      true
    }
    var prev = -1
    while (outN < nPixels) {
      val code = read()
      if (code < 0) return null
      if (code == clear) { next = eoi + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == eoi) return null // EOI before all pixels decoded
      else if (prev == -1) {
        if (code >= clear) return null // first code after clear must be a root
        if (!expand(code)) return null
        prev = code
      } else {
        if (code < next) {
          if (!expand(code)) return null
          if (next < 4096) { prefix(next) = prev; suffix(next) = firstOf(code); next += 1 }
        } else if (code == next && next < 4096) {
          // KwKwK: the one legal forward reference
          prefix(next) = prev; suffix(next) = firstOf(prev); next += 1
          if (!expand(next - 1)) return null
        } else return null
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    out
  }
}
