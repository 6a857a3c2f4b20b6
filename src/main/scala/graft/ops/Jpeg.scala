package graft.ops

/** Baseline-JFIF grayscale JPEG codec — the second real image codec of
  * the perceptual rung (the PNG codec lives in [[Multimodal]]).
  *
  * Why it exists: real crawled image corpora are overwhelmingly JPEG,
  * and the round-8 perceptual families (q121 aHash / q125 dHash) hash
  * only payloads the PNG decoder accepts — a JPEG re-encode of a held
  * image sailed past the whole image-dedup rung. This codec closes that
  * hole: [[decode]] parses a real baseline JFIF stream (markers, DQT /
  * DHT / SOF0 / DRI / SOS, entropy-coded scan with byte stuffing and
  * restart markers, Huffman → dequant → IDCT → level shift + clamp) and
  * [[jpegBytes]] writes one (FDCT → quantize → Huffman, Annex K
  * luminance tables), so the cross-format query (q126) can drive
  * encode→decode round trips on synthesized payloads exactly as q121
  * does for PNG. (Reference parity note: the reference engine,
  * Converter.go:1-565, has no media path at all — this rung is the
  * training-pipeline extension surface.)
  *
  * Determinism contract with the DuckDB oracle: JPEG is lossy in
  * general, so the oracle CANNOT mirror an arbitrary round trip. But a
  * block-SOLID 8×8 tile round-trips exactly whenever the DC quant step
  * divides 8·(v−128):
  *  - every AC coefficient of a solid tile is a (v−128)-scaled product
  *    of Σₓcos((2x+1)uπ/16) terms that are mathematically zero and
  *    float-zero to ~1e−14 — quantization rounds them to exactly 0;
  *  - the DC coefficient is 8·(v−128)·(1±ε); with quant step q | 8
  *    the quantized value rounds to the exact integer 8·(v−128)/q;
  *  - a DC-only IDCT is pixel = DC/8 + 128 — powers of two throughout,
  *    exact in IEEE doubles.
  * So the q126 synthesis rule emits 16×16 images of four SOLID 8×8
  * tiles and keeps `dcQuant` in {1,2,4,8}; the oracle then computes
  * perceptual hashes from the tile rule directly while the engine runs
  * the full codec. JpegSpec pins the exact round trip for the solid
  * class, the ±1-bounded error for general pixels at unit quant, and
  * None on fuzzed/truncated payloads.
  */
object Jpeg {

  /** JPEG zigzag scan order: zigzag index → natural (row-major) index. */
  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ITU T.81 Annex K.3.3 typical luminance Huffman tables (public spec).
  // BITS(i) = number of codes of length i+1; HUFFVAL in code order.
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman codes from a BITS/HUFFVAL pair: value → (code,
    * length). Shared construction for the encoder; the decoder builds
    * its tables from the DHT segment it parses, so an encoder/decoder
    * disagreement is impossible by construction only when the stream's
    * tables are read back — which is the point of parsing them. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private lazy val DcCodes = canonicalCodes(DcBits, DcVals)
  private lazy val AcCodes = canonicalCodes(AcBits, AcVals)

  /** Bit magnitude category of a DC difference / AC value (T.81 F.1.2.1). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (nbits > 0) { put(0xff, 8 - nbits); }
  }

  /** cos((2n+1)·f·π/16) lookup, n = sample index, f = frequency — the
    * transcendental per MULTIPLY was the dominant cost of the whole
    * cross-format rung (q126 measured 56.7 s at the 100× corpus with
    * `math.cos` inline; the table makes the DCT pure multiply-adds).
    * Same table serves FDCT and IDCT; values are identical doubles to
    * the former inline calls, so round trips are bit-unchanged. */
  private val CosTable: Array[Double] =
    Array.tabulate(64)(i => math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2)

  private def fdctQuant(tile: Array[Double], quant: Array[Int]): Array[Int] = {
    // separable 2-D DCT-II with orthonormal scaling (T.81 A.3.3)
    val tmp = new Array[Double](64)
    val outD = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var n = 0
        while (n < 8) { s += tile(u * 8 + n) * CosTable(n * 8 + x); n += 1 }
        tmp(u * 8 + x) = s * (if (x == 0) InvSqrt2 else 1.0)
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) { // columns
      var v = 0
      while (v < 8) {
        var s = 0.0
        var n = 0
        while (n < 8) { s += tmp(n * 8 + y) * CosTable(n * 8 + v); n += 1 }
        outD(v * 8 + y) = s * (if (v == 0) InvSqrt2 else 1.0) / 4.0
        v += 1
      }
      y += 1
    }
    Array.tabulate(64)(i => math.round(outD(Zigzag(i)) / quant(i)).toInt)
  }

  private def be16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def segment(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    be16(out, body.length + 2)
    out.write(body, 0, body.length)
  }

  /** Encode 8-bit grayscale pixels as a baseline JFIF stream.
    *
    * Encoder knobs exist for the SAME reason as [[Multimodal.pngBytes]]'s:
    * so identical pixels can be written as byte-DIFFERENT payloads — a
    * re-encoded duplicate. `dcQuant` is the DC quantization step (keep
    * it in {1,2,4,8} for the exact solid-tile round trip; any 1-255 is
    * legal), `acQuant` scales the AC steps (irrelevant to solid tiles,
    * byte-visible in the DQT), `restartInterval` > 0 emits DRI + RSTn
    * markers every n MCUs, and `comment` injects a COM segment. */
  def jpegBytes(width: Int, height: Int, gray: Array[Int],
      dcQuant: Int = 8, acQuant: Int = 16,
      restartInterval: Int = 0, comment: String = ""): Array[Byte] = {
    require(gray.length == width * height, "pixel count must match dimensions")
    require(width % 8 == 0 && height % 8 == 0,
      "this encoder writes full MCUs only (dims must be multiples of 8)")
    require(dcQuant >= 1 && dcQuant <= 255 && acQuant >= 1 && acQuant <= 255,
      "8-bit quantization steps")
    require(restartInterval >= 0, "restart interval must be non-negative")
    val quant = Array.tabulate(64)(i => if (i == 0) dcQuant else acQuant)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    segment(out, 0xe0, Array[Byte]( // APP0 JFIF 1.1, no density, no thumb
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    if (comment.nonEmpty)
      segment(out, 0xfe, comment.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    segment(out, 0xdb, Array[Byte](0) ++ quant.map(_.toByte)) // DQT, Pq=0/Tq=0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); be16(sof, height); be16(sof, width)
    sof.write(1); sof.write(1); sof.write(0x11); sof.write(0) // 1 comp, 1x1, Tq 0
    segment(out, 0xc0, sof.toByteArray) // SOF0
    segment(out, 0xc4, // DHT: DC class-0 id-0 and AC class-1 id-0 in one segment
      (Array(0x00) ++ DcBits ++ DcVals ++ Array(0x10) ++ AcBits ++ AcVals).map(_.toByte))
    if (restartInterval > 0) {
      val dri = new java.io.ByteArrayOutputStream()
      be16(dri, restartInterval)
      segment(out, 0xdd, dri.toByteArray)
    }
    segment(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, Td/Ta 0
    var bw = new BitWriter(out)
    var prevDc = 0
    var mcu = 0
    var rst = 0
    val tile = new Array[Double](64)
    var by = 0
    while (by < height / 8) {
      var bx = 0
      while (bx < width / 8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rst) // RSTn
          rst = (rst + 1) % 8
          prevDc = 0
          bw = new BitWriter(out)
        }
        var i = 0
        while (i < 64) {
          tile(i) = gray(((by * 8 + i / 8) * width) + bx * 8 + i % 8) - 128.0
          i += 1
        }
        val coefs = fdctQuant(tile, quant)
        // DC: category + magnitude bits of the diff
        val diff = coefs(0) - prevDc
        prevDc = coefs(0)
        val s = category(diff)
        val (dcCode, dcLen) = DcCodes(s)
        bw.put(dcCode, dcLen)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        // AC: run-length of zeros + category, ZRL for 16+, EOB at tail
        var k = 1
        var run = 0
        while (k < 64) {
          val v = coefs(k)
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (c, l) = AcCodes(0xf0); bw.put(c, l); run -= 16
            }
            val sz = category(v)
            val (c, l) = AcCodes((run << 4) | sz)
            bw.put(c, l)
            bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = AcCodes(0x00); bw.put(c, l) } // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Huffman decode table: flat (code-length → first code / value index)
    * arrays per T.81 F.2.2.3 — MINCODE/MAXCODE/VALPTR. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Int] = vals
    private var codeInit = 0
    private var kInit = 0
    for (len <- 1 to 16) {
      if (bits(len - 1) > 0) {
        valPtr(len) = kInit
        minCode(len) = codeInit
        codeInit += bits(len - 1); kInit += bits(len - 1)
        maxCode(len) = codeInit - 1
      }
      codeInit <<= 1
    }
  }

  /** Entropy-coded-segment bit reader with FF00 destuffing; a bare FF
    * marker (RST/EOI) ends the current segment — the caller handles it. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** -1 when the next bytes are a marker, not entropy data. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) return -1
        val b = p(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= p.length) return -1
          val b2 = p(pos + 1) & 0xff
          if (b2 != 0x00) return -1 // marker: stop here, caller consumes it
          pos += 2
        } else pos += 1
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.huffVal(t.valPtr(len) + code - t.minCode(len))
      }
      -1
    }
    /** Re-align to a byte boundary (before a restart marker). */
    def align(): Unit = nbits = 0
  }

  /** T.81 F.2.2.1 EXTEND: map s magnitude bits to a signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JFIF grayscale stream to (width, height, pixels);
    * None for anything that is not a well-formed single-component
    * baseline JPEG — the scan-phase contract of [[Multimodal.pngDecode]]:
    * bytes in, typed media out, no thrown errors on crawled garbage. */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decodeInner(p) catch { case scala.util.control.NonFatal(_) => None }

  private def decodeInner(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var pos = 2
    var width = 0
    var height = 0
    var quant: Array[Int] = null
    var dcTable: HuffTable = null
    var acTable: HuffTable = null
    var restartInterval = 0
    var sofSeen = false
    // marker segments up to SOS
    while (true) {
      if (pos + 4 > p.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xda) { // SOS
        val len = u16(pos + 2)
        if (u8(pos + 4) != 1) return None // one component only
        pos += 2 + len
        if (!sofSeen || quant == null || dcTable == null || acTable == null) return None
        // entropy-coded scan
        val bw = width / 8; val bh = height / 8
        val gray = new Array[Int](width * height)
        val br = new BitReader(p, pos)
        var prevDc = 0
        var mcu = 0
        val coefs = new Array[Int](64)
        val tmp = new Array[Double](64)
        while (mcu < bw * bh) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.align()
            if (br.pos + 2 > p.length || u8(br.pos) != 0xff ||
              (u8(br.pos + 1) & 0xf8) != 0xd0) return None
            br.pos += 2
            prevDc = 0
          }
          java.util.Arrays.fill(coefs, 0)
          val s = br.decodeHuff(dcTable)
          if (s < 0 || s > 11) return None
          val diffBits = if (s == 0) 0 else br.bits(s)
          if (diffBits < 0) return None
          prevDc += extend(diffBits, s)
          coefs(0) = prevDc * quant(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = br.decodeHuff(acTable)
            if (rs < 0) return None
            val run = rs >> 4; val size = rs & 0xf
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true
            } else {
              k += run
              if (k > 63) return None
              val vb = br.bits(size)
              if (vb < 0) return None
              coefs(Zigzag(k)) = extend(vb, size) * quant(k)
              k += 1
            }
          }
          // separable IDCT (coefs are in NATURAL order after dequant,
          // except index 0 which is zigzag(0) = natural 0)
          idct(coefs, tmp)
          val by = mcu / bw; val bx = mcu % bw
          var i = 0
          while (i < 64) {
            val v = math.round(tmp(i) + 128.0).toInt
            gray((by * 8 + i / 8) * width + bx * 8 + i % 8) =
              math.max(0, math.min(255, v))
            i += 1
          }
          mcu += 1
        }
        return Some((width, height, gray))
      }
      marker match {
        case 0xd9 => return None // EOI before SOS
        case 0xc0 => // SOF0 baseline
          val len = u16(pos + 2)
          if (u8(pos + 4) != 8) return None // 8-bit precision
          height = u16(pos + 5); width = u16(pos + 7)
          if (u8(pos + 9) != 1) return None // one component
          if (u8(pos + 11) != 0x11) return None // 1x1 sampling
          if (width <= 0 || height <= 0 || width % 8 != 0 || height % 8 != 0) return None
          // Dimension cap BEFORE allocation: a 2 KB hostile payload can
          // declare 40000x40000 and the width*height Int array would be a
          // ~6.4 GB allocation whose OutOfMemoryError is fatal (not
          // caught by NonFatal), killing the executor despite the
          // total-decode contract. 1<<24 px (16 MP) is far above any
          // fixture and far below any heap hazard.
          if (width.toLong * height.toLong > (1L << 24)) return None
          sofSeen = true
          pos += 2 + len
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // progressive / arithmetic / other SOF: not baseline
        case 0xdb => // DQT
          val len = u16(pos + 2)
          var q = pos + 4
          while (q < pos + 2 + len) {
            if (u8(q) != 0x00) return None // 8-bit table 0 only (one comp)
            quant = Array.tabulate(64)(i => u8(q + 1 + i))
            q += 65
          }
          pos += 2 + len
        case 0xc4 => // DHT
          val len = u16(pos + 2)
          var q = pos + 4
          while (q < pos + 2 + len) {
            val tcTh = u8(q)
            val bits = Array.tabulate(16)(i => u8(q + 1 + i))
            val n = bits.sum
            if (n > 256 || q + 17 + n > pos + 2 + len) return None
            val vals = Array.tabulate(n)(i => u8(q + 17 + i))
            if ((tcTh >> 4) == 0) dcTable = new HuffTable(bits, vals)
            else acTable = new HuffTable(bits, vals)
            q += 17 + n
          }
          pos += 2 + len
        case 0xdd => // DRI
          restartInterval = u16(pos + 4)
          pos += 2 + u16(pos + 2)
        case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => // APPn / COM
          pos += 2 + u16(pos + 2)
        case _ => return None
      }
    }
    None
  }

  /** Separable 2-D IDCT (orthonormal), coefficients in natural order.
    * A DC-only block reduces to pixel = DC/8 — exact in doubles. */
  private def idct(coefs: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // columns first
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val c = if (v == 0) InvSqrt2 else 1.0
          s += c * coefs(v * 8 + y) * CosTable(x * 8 + v)
          v += 1
        }
        tmp(x * 8 + y) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // then rows
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val c = if (u == 0) InvSqrt2 else 1.0
          s += c * tmp(x * 8 + u) * CosTable(y2 * 8 + u)
          u += 1
        }
        out(x * 8 + y2) = s / 4.0
        y2 += 1
      }
      x += 1
    }
  }
}
