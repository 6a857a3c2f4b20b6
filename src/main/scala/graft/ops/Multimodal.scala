package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One record of opaque media: typed metadata + the raw bytes. In a real
  * pipeline `payload` holds an encoded image/audio/video blob; here the
  * documents' UTF-8 bytes stand in (the container has no media columns or
  * codec libraries). */
final case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Audio decoder output: the scan-phase metadata an audio pipeline
  * extracts before resampling/feature extraction. */
final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
    bits_per_sample: Long, n_samples: Long, duration_ms: Long)

/** Decoder output: per-asset metadata a multimodal training pipeline
  * extracts before batching. */
final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
    height: Long, channels: Long, mean_pixel: Double,
    resized_w: Long, resized_h: Long)

/** Multimodal-column plumbing: binary payloads flow through a typed
  * `Dataset` with a partition-at-a-time decode. The Spark-side shape —
  * schema, encoder, `mapPartitions` batch signature, partition sizing —
  * is real and tested; only [[Multimodal.stubDecode]] is a stand-in.
  *
  * Scale notes: `mapPartitions` (not per-row `map`) is deliberate — a
  * real decoder amortizes codec/model initialization once per partition
  * (the same shape a Python pipeline gets from `mapInPandas` batches).
  * Binary payloads ride Spark's binary columns, so parquet encodes them
  * as BYTE_ARRAY with page compression; decode output is a narrow typed
  * row, so the downstream plan is columnar again.
  */
object Multimodal {

  /** Real container-header parse: PNG / JPEG / GIF magic bytes →
    * (width, height, channels). Pure JVM, no codec dependency — exactly
    * what a scan-phase metadata pass extracts before any pixel decode.
    * Returns None for non-media payloads (the testdata documents), which
    * then fall back to [[stubDecode]]. */
  def imageHeader(p: Array[Byte]): Option[(Long, Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length >= 26 && be32(0) == 0x89504e47L && be32(4) == 0x0d0a1a0aL) {
      // PNG: 8-byte signature, IHDR chunk at fixed offset — width/height
      // are big-endian u32 at 16/20, color type at 25
      val channels = u8(25) match {
        case 0 => 1L // greyscale
        case 2 => 3L // truecolor
        case 3 => 1L // palette
        case 4 => 2L // grey + alpha
        case 6 => 4L // truecolor + alpha
        case _ => return None
      }
      Some((be32(16), be32(20), channels))
    } else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      // GIF87a/89a: logical screen width/height, little-endian u16 at 6/8
      Some((le16(6).toLong, le16(8).toLong, 3L))
    } else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      // (C0-CF except C4/C8/CC): [len][precision][height u16][width u16][ncomp]
      var i = 2
      while (i + 9 <= p.length) {
        if (u8(i) != 0xff) return None
        val marker = u8(i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // standalone RSTn/SOI/EOI
        else {
          val len = be16(i + 2)
          if (len < 2 || i + 2 + len > p.length) return None
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some((be16(i + 7).toLong, be16(i + 5).toLong, u8(i + 9).toLong))
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** STUB — deterministic fake decode for payloads that are not a
    * recognized media container (the testdata documents' UTF-8 bytes).
    * A production build replaces this body with a real pixel decode;
    * everything around it keeps working because the contract is just
    * bytes → metadata. */
  /** Fit (w, h) into a 224x224 box preserving aspect ratio —
    * integer-only math (floor division) so every engine agrees. */
  private def resize224(w: Long, h: Long): (Long, Long) =
    if (w >= h) (224L, math.max(h * 224 / w, 1))
    else (math.max(w * 224 / h, 1), 224L)

  def stubDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val w = math.max(n % 640, 1)
    val h = math.max((n * 7) % 480, 1)
    val (rw, rh) = resize224(w, h)
    MediaMeta(
      doc_id = -1L, // filled by caller
      n_bytes = n,
      width = w,
      height = h,
      channels = 3L,
      mean_pixel = BigDecimal((n * 31 % 256) / 255.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      resized_w = rw,
      resized_h = rh)
  }

  /** Per-record decode: real container-header parse when the payload is a
    * recognized image format, stub fallback otherwise. mean_pixel stays a
    * deterministic byte statistic in both paths — a true pixel mean needs
    * the full decode this container can't ship (that swap is one line,
    * inside the same contract). */
  def decodeMeta(docId: Long, payload: Array[Byte]): MediaMeta =
    imageHeader(payload) match {
      case Some((w, h, c)) =>
        val (rw, rh) = resize224(w, h)
        MediaMeta(docId, payload.length.toLong, w, h, c,
          BigDecimal((payload.length.toLong * 31 % 256) / 255.0)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, rw, rh)
      case None => stubDecode(payload).copy(doc_id = docId)
    }

  /** Minimal RIFF/WAVE PCM writer: canonical 44-byte header + data.
    * Used by tests and by [[audioMeta]]'s payload synthesis (the
    * container ships no audio columns, so valid WAV bytes are built from
    * the document bytes — the PARSER below is the real operator). */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val blockAlign = channels * bitsPerSample / 8
    out.put("RIFF".getBytes("US-ASCII")); out.putInt(36 + data.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")); out.putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort); out.putInt(sampleRate)
    out.putInt(sampleRate * blockAlign); out.putShort(blockAlign.toShort)
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes("US-ASCII")); out.putInt(data.length); out.put(data)
    out.array()
  }

  /** Real RIFF/WAVE header parse: validates the RIFF/WAVE magic then
    * walks the chunk list to `fmt ` and `data` (chunks are word-aligned,
    * and `fmt ` need not immediately precede `data` — LIST/INFO chunks
    * are skipped like any other). Returns (sampleRate, channels,
    * bitsPerSample, nSamples); None for non-WAV payloads. */
  def audioHeader(p: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var rate = -1L; var ch = -1L; var bits = -1L; var dataLen = -1L
    while (i + 8 <= p.length && (rate < 0 || dataLen < 0)) {
      val sz = le32(i + 4)
      // a size field past the payload (or >= 2^31, which would turn the
      // step negative after toInt) ends the walk — the data chunk is
      // still usable because its length clamps to the real payload
      // the fmt fields live INSIDE the chunk: require the declared size
      // to cover them (16 bytes for PCM), or a zero-size hostile fmt
      // chunk would read ch/rate/bits from the NEXT chunk's bytes
      if (tag(i, "fmt ") && sz >= 16 && i + 24 <= p.length) {
        ch = le16(i + 10).toLong; rate = le32(i + 12); bits = le16(i + 22).toLong
      } else if (tag(i, "data")) dataLen = math.min(sz, (p.length - i - 8).toLong)
      if (sz > p.length) i = p.length // malformed: stop after this chunk
      else i += 8 + sz.toInt + (sz.toInt & 1) // chunks are 2-byte aligned
    }
    if (rate > 0 && ch > 0 && bits > 0 && dataLen >= 0)
      Some((rate, ch, bits, dataLen / (ch * bits / 8)))
    else None
  }

  /** q71: audio-column plumbing end-to-end. Each document's bytes become
    * a valid PCM WAV payload (rate/channels varied deterministically by
    * doc_id, data = text bytes truncated to a 4-byte multiple so every
    * channel config divides evenly, zero-padded to at least 4), and the
    * REAL chunk-walking parser above extracts the metadata back. The
    * synthesis stands in for the missing media column; the parse is the
    * operator. Same mapPartitions shape as [[decode]] — a real codec
    * initializes once per partition. */
  def audioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { r =>
          val rate = 8000 + (r.doc_id % 3).toInt * 4000
          val ch = 1 + (r.doc_id % 2).toInt
          val dataLen = math.max(r.payload.length / 4 * 4, 4)
          val data = java.util.Arrays.copyOf(r.payload, dataLen)
          val wav = wavBytes(rate, ch, 16, data)
          val (pRate, pCh, pBits, pSamples) = audioHeader(wav)
            .getOrElse(throw new IllegalStateException(s"unparseable WAV for doc ${r.doc_id}"))
          AudioMeta(r.doc_id, pRate, pCh, pBits, pSamples, pSamples * 1000L / pRate)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Parse a PCM WAV payload down to its SAMPLES — the decode step the
    * metadata-only [[audioHeader]] stops short of: same chunk walk, but
    * the `data` chunk's 16-bit little-endian samples come back as ints.
    * Crawl-safe like every decoder here: total (None on garbage), every
    * position strictly advances, and the sample count is capped before
    * allocation. Only 16-bit PCM is decoded (the dominant uncompressed
    * wild format; other depths answer None rather than mis-scale). */
  def pcmSamples(p: Array[Byte]): Option[(Long, Long, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var rate = -1L; var ch = -1L; var bits = -1L
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= p.length && (rate < 0 || dataLen < 0)) {
      val sz = le32(i + 4)
      if (tag(i, "fmt ") && sz >= 16 && i + 24 <= p.length) {
        ch = le16(i + 10).toLong; rate = le32(i + 12); bits = le16(i + 22).toLong
      } else if (tag(i, "data")) {
        dataOff = i + 8
        dataLen = math.min(sz, (p.length - i - 8).toLong)
      }
      if (sz > p.length) i = p.length
      else i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0 || dataLen < 0) return None
    val n = (dataLen / 2).toInt
    if (n > (1 << 24)) return None // sample cap before allocation
    val samples = new Array[Int](n)
    var j = 0
    while (j < n) {
      samples(j) = (le16(dataOff + 2 * j) << 16) >> 16 // sign-extend Int16
      j += 1
    }
    Some((rate, ch, samples))
  }

  /** 64-frame energy-gradient audio fingerprint: the samples are split
    * into 64 equal frames, frame energy = Σ sample² (exact Long), and
    * bit b = energy(b) > energy((b+1) mod 64) — [[dHash64]]'s adjacent-
    * comparison rule in one dimension. GAIN-INVARIANT by construction:
    * scaling every sample by g > 0 scales every energy by g², which
    * preserves strict order exactly (integer math, no rounding), so a
    * re-mastered / volume-normalized copy lands on the identical
    * fingerprint while its payload hash (q116's exact rung) changes
    * completely. Same (hi, lo) packing as [[aHash64]], so the banding,
    * cap, and oracle tail are shared verbatim. */
  private[graft] def audioFingerprint(samples: Array[Int]): Option[(Long, Long)] = {
    val n = samples.length
    if (n < 64) return None
    val frame = n / 64
    val energies = new Array[Long](64)
    var f = 0
    while (f < 64) {
      var s = 0L
      var i = f * frame
      val end = i + frame
      while (i < end) { val v = samples(i).toLong; s += v * v; i += 1 }
      energies(f) = s
      f += 1
    }
    Some(packBits(b => energies(b) > energies((b + 1) % 64)))
  }

  /** Deterministic 64-frame amplitude synthesis from document text:
    * frame f amplitude = codePoint(f mod len) mod 256 — [[solidPixelsOf]]
    * in one dimension, shared verbatim with the q134 oracle's
    * `unicode(text[i]) % 256` comprehension. */
  private[graft] def frameAmpsOf(text: String): Array[Int] = {
    val cps = text.codePoints().toArray
    Array.tabulate(64)(f => cps(f % cps.length) % 256)
  }

  /** q134: PERCEPTUAL audio dedup — the rung q116's exact payload
    * hashing cannot reach: a gain-scaled or re-mastered copy of the
    * same recording is byte-unrelated to its source, but its frame-
    * energy ORDER is untouched, so the energy-gradient fingerprint
    * pairs them at hamming 0. Completes the multimodal dedup trio
    * (text MinHash/SimHash, image aHash/dHash, audio energy-gradient).
    *
    * Pipeline = q121's verbatim with an audio front end: synthesize a
    * real PCM WAV per doc (frame amplitudes from the text rule; GAIN,
    * sample rate, frame width and a trailing LIST chunk varied by
    * doc_id, so byte equality is destroyed even between same-text docs),
    * parse it back with the real chunk-walking [[pcmSamples]] decoder,
    * fingerprint, then the shared banded/capped/hamming-verified pair
    * stage. The oracle computes fingerprints straight from the text
    * rule: energies are F·(amp·gain)² and gain/width cancel in every
    * comparison, so the banded chain reads amp order directly — the
    * q126 argument with gain in place of quantization. */
  def perceptualAudioDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBandPopulation: Int = 1000): DataFrame = {
    import spark.implicits._
    val hashes = Tables.documents(spark, dir)
      .where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val amps = frameAmpsOf(text)
          val gain = 1 + math.floorMod(id, 4).toInt
          val rate = 8000 + math.floorMod(id, 3).toInt * 4000
          val spf = 8 << math.floorMod(id, 2).toInt // 8 or 16 samples/frame
          val data = new Array[Byte](64 * spf * 2)
          var f = 0
          while (f < 64) {
            val v = amps(f) * gain
            var s = 0
            while (s < spf) {
              val off = (f * spf + s) * 2
              data(off) = (v & 0xff).toByte
              data(off + 1) = ((v >> 8) & 0xff).toByte
              s += 1
            }
            f += 1
          }
          val wav0 = wavBytes(rate, 1, 16, data)
          val wav =
            if (math.floorMod(id, 3) == 0) {
              // trailing LIST chunk (tag, size=4 LE, "INFO"): a legal
              // RIFF tail the chunk walk must tolerate
              val junk = "LIST".getBytes("US-ASCII") ++
                Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
              val out = java.util.Arrays.copyOf(wav0, wav0.length + junk.length)
              System.arraycopy(junk, 0, out, wav0.length, junk.length)
              out
            } else wav0
          val (_, _, samples) = pcmSamples(wav)
            .getOrElse(throw new IllegalStateException(s"unparseable WAV for doc $id"))
          val (hi, lo) = audioFingerprint(samples)
            .getOrElse(throw new IllegalStateException(s"unfingerprintable doc $id"))
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "hi", "lo")
    perceptualDupsOfHashes(hashes, maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")
  }

  /** Minimal ISO-BMFF (MP4) writer: `ftyp` + `moov`/`mvhd` (version 0)
    * + `mdat`. Big-endian box sizes, canonical 108-byte mvhd. Synthesis
    * counterpart of [[videoHeader]], as [[wavBytes]] is for
    * [[audioHeader]]. */
  def mp4Bytes(timescale: Int, duration: Long, data: Array[Byte]): Array[Byte] = {
    val mvhdPayload = 100 // v0: fixed fields through next_track_id
    val out = java.nio.ByteBuffer.allocate(16 + 8 + 8 + mvhdPayload + 8 + data.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putInt(16); out.put("ftyp".getBytes("US-ASCII"))
    out.put("isom".getBytes("US-ASCII")); out.putInt(0) // brand + minor version
    out.putInt(8 + 8 + mvhdPayload); out.put("moov".getBytes("US-ASCII"))
    out.putInt(8 + mvhdPayload); out.put("mvhd".getBytes("US-ASCII"))
    out.putInt(0) // version 0 + flags
    out.putInt(0); out.putInt(0) // creation, modification
    out.putInt(timescale); out.putInt(duration.toInt)
    out.putInt(0x00010000); out.putShort(0x0100.toShort); out.putShort(0) // rate, volume, reserved
    out.putLong(0) // reserved
    // unity matrix
    out.putInt(0x00010000); out.putInt(0); out.putInt(0)
    out.putInt(0); out.putInt(0x00010000); out.putInt(0)
    out.putInt(0); out.putInt(0); out.putInt(0x40000000)
    (0 until 6).foreach(_ => out.putInt(0)) // pre_defined
    out.putInt(2) // next_track_id
    out.putInt(8 + data.length); out.put("mdat".getBytes("US-ASCII")); out.put(data)
    out.array()
  }

  /** Real ISO-BMFF box walk: top-level boxes to `moov`, `moov` children
    * to `mvhd` (version 0 or 1), plus the total `mdat` payload size.
    * Returns (timescale, duration, mdatBytes); None for non-MP4
    * payloads (no leading `ftyp`). */
  def videoHeader(p: Array[Byte]): Option[(Long, Long, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int, s: String): Boolean = (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 16 || !tag(4, "ftyp")) return None
    var timescale = -1L; var duration = -1L; var mdat = 0L
    var i = 0
    while (i + 8 <= p.length) {
      val sz = be32(i)
      if (sz < 8 || i + sz > p.length) return None // malformed box
      if (tag(i + 4, "moov")) {
        var j = i + 8
        while (j + 8 <= i + sz) {
          val csz = be32(j)
          if (csz < 8 || j + csz > i + sz) return None
          if (tag(j + 4, "mvhd") && csz >= 32) {
            val v = u8(j + 8)
            if (v == 0) { timescale = be32(j + 20); duration = be32(j + 24) }
            // v1 widens creation/modification/duration to u64: the
            // duration read ends at j+40, so a 32..39-byte box is
            // malformed for v1 (not just for-us-too-short)
            else if (csz >= 40) { timescale = be32(j + 28); duration = be64(j + 32) }
            else return None
          }
          j += csz.toInt
        }
      } else if (tag(i + 4, "mdat")) mdat += sz - 8
      i += sz.toInt
    }
    if (timescale > 0 && duration >= 0) Some((timescale, duration, mdat)) else None
  }

  /** q75: video-column plumbing end-to-end — synthesized MP4 containers
    * (timescale varied by doc_id, duration tied to payload size, mdat =
    * the doc bytes) parsed back by the REAL box walker. Completes the
    * image (q40) / audio (q71) / video (q75) header-parse trio. */
  def videoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { r =>
          val timescale = 600 + (r.doc_id % 4).toInt * 300
          val duration = r.payload.length.toLong * 10
          val mp4 = mp4Bytes(timescale, duration, r.payload)
          val (ts, dur, mdat) = videoHeader(mp4)
            .getOrElse(throw new IllegalStateException(s"unparseable MP4 for doc ${r.doc_id}"))
          (r.doc_id, ts, dur, mdat, dur * 1000L / ts)
        }
      }
      .toDF("doc_id", "timescale", "duration", "mdat_bytes", "duration_ms")
      .orderBy("doc_id")
  }

  /** Typed decode pipeline over the documents' bytes. */
  def decode(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        // per-partition init would go here (codec handles, model weights)
        batch.map(r => decodeMeta(r.doc_id, r.payload))
      }
  }

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    decode(spark, dir).toDF().orderBy("doc_id")

  /** q116: cross-payload frame-level dup detection — the video-dedup
    * shape: hash each fixed-stride frame of every payload, bucket
    * payloads by shared frame hashes, report pairs sharing ≥ `minShared`
    * frames. The STUB "frame" is a 100-char payload slice and the
    * "perceptual hash" is md5 of it (a real build swaps in a decoded-
    * frame pHash inside mapPartitions — the plumbing, candidate join,
    * and cap are what this pins). Exact-dup payloads share every frame;
    * partially-reencoded ones (here: the corpus's planted near-dups,
    * when aligned) share a prefix run.
    *
    * Scale shape — the LSH discipline applied to frames: per-payload
    * frames are DISTINCT-ed before the join so a payload repeating one
    * boilerplate frame can't amplify, candidates come from a self
    * equi-join on the frame hash (cost ∝ collisions, never payload
    * pairs), and hot hashes (intros, color bars, silence) are dropped
    * whole by the same population-cap pattern as [[Dedup.capBands]] —
    * true dups still surface through their other frames. */
  def frameDups(spark: SparkSession, dir: String,
      frameChars: Int = 100, minShared: Int = 3,
      maxFramePopulation: Int = 1000): DataFrame =
    frameDupsOf(Tables.documents(spark, dir), frameChars, minShared, maxFramePopulation)

  /** The q116 pipeline over any (doc_id, text-as-payload) relation —
    * split out so the planted-frame spec can drive known alignments. */
  private[graft] def frameDupsOf(docs: DataFrame,
      frameChars: Int, minShared: Int, maxFramePopulation: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val frames = docs
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L),
          expr(s"(greatest(length(text), 1) - 1) div $frameChars"))))
      .select(col("doc_id"),
        md5(expr(s"cast(substring(text, pos * $frameChars + 1, $frameChars) as binary)"))
          .as("fh"))
      .distinct()
    val hot = frames.groupBy("fh").agg(count(lit(1)).as("n"))
      .where(col("n") > maxFramePopulation).select("fh")
    val cool = frames.join(broadcast(hot), Seq("fh"), "left_anti")
    cool.as("a")
      .join(cool.as("b"), col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** Minimal PNG writer for 8-bit GRAYSCALE images — real zlib DEFLATE
    * (java.util.zip.Deflater), real CRC32 chunk checksums, all five PNG
    * scanline filter types. The encoder knobs (`filterType`, compression
    * `level`, IDAT `chunk` split) exist so the SAME pixels can be
    * written as byte-DIFFERENT payloads — exactly what a re-encoded
    * duplicate image looks like in a crawl, and what [[perceptualDups]]
    * must catch where exact payload hashing ([[frameDups]]) cannot.
    * Synthesis counterpart of [[pngDecode]], as [[wavBytes]] is for
    * [[audioHeader]] (reference parity note: the reference engine,
    * Converter.go:1-565, has no media path at all — this whole rung is
    * the training-pipeline extension surface). */
  def pngBytes(width: Int, height: Int, gray: Array[Int],
      filterType: Int = 0, level: Int = 6,
      chunk: Int = Int.MaxValue): Array[Byte] = {
    require(gray.length == width * height, "pixel count must match dimensions")
    require(filterType >= 0 && filterType <= 4, "PNG filter types are 0-4")
    require(chunk > 0, "IDAT chunk size must be positive")
    // per-row filtering (bpp = 1): raw(x-1) is `left`, prior(x) is `up`
    val raw = new Array[Byte]((width + 1) * height)
    var r = 0
    while (r < height) {
      raw(r * (width + 1)) = filterType.toByte
      var c = 0
      while (c < width) {
        val x = gray(r * width + c)
        val left = if (c > 0) gray(r * width + c - 1) else 0
        val up = if (r > 0) gray((r - 1) * width + c) else 0
        val ul = if (r > 0 && c > 0) gray((r - 1) * width + c - 1) else 0
        val f = filterType match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            x - pred
        }
        raw(r * (width + 1) + 1 + c) = f.toByte
        c += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater(level)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zbuf.toByteArray
    def chunkBytes(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length); out.put(typ.getBytes("US-ASCII")); out.put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width); ihdr.putInt(height)
    ihdr.put(8.toByte); ihdr.put(0.toByte) // bit depth 8, color type 0 (gray)
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte) // deflate/adaptive/no-interlace
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(chunkBytes("IHDR", ihdr.array()))
    var off = 0 // IDAT may split at any byte boundary; decoders concatenate
    while (off < z.length || off == 0) {
      val n = math.min(chunk, z.length - off)
      out.write(chunkBytes("IDAT", java.util.Arrays.copyOfRange(z, off, off + n)))
      off += math.max(n, 1)
    }
    out.write(chunkBytes("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Real PNG decode for the 8-bit grayscale profile [[pngBytes]] emits:
    * signature + IHDR validation, IDAT concatenation across chunk
    * splits, zlib INFLATE, and reversal of all five scanline filters.
    * Returns (width, height, pixels); None for non-PNG payloads or
    * profiles outside 8-bit gray — the scan-phase contract, like
    * [[audioHeader]]/[[videoHeader]]: bytes in, typed media out. */
  def pngDecode(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def tag(i: Int, s: String): Boolean = (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 45 || be32(0) != 0x89504e47L || be32(4) != 0x0d0a1a0aL) return None
    if (!tag(12, "IHDR") || be32(8) != 13) return None
    val width = be32(16).toInt; val height = be32(20).toInt
    if (width <= 0 || height <= 0 || u8(24) != 8 || u8(25) != 0) return None
    // Same dimension cap as the JPEG decoder: declared dims drive the
    // (width+1)*height filter-buffer allocation before any IDAT byte is
    // validated, and an OutOfMemoryError from a hostile 2 KB payload
    // declaring 40000x40000 is fatal (NonFatal doesn't catch it).
    if (width.toLong * height.toLong > (1L << 24)) return None
    val z = new java.io.ByteArrayOutputStream()
    var i = 33 // first chunk after IHDR
    while (i + 12 <= p.length && !tag(i + 4, "IEND")) {
      val sz = be32(i)
      if (i + 12 + sz > p.length) return None
      if (tag(i + 4, "IDAT")) z.write(p, i + 8, sz.toInt)
      i += 12 + sz.toInt
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(z.toByteArray)
    val raw = new Array[Byte]((width + 1) * height)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished means the stream is truncated
        // (needsInput) OR demands a preset dictionary (FDICT set —
        // needsDictionary, which we never supply). Either way no further
        // call can make progress with the input fully set upfront, so
        // bail instead of spinning the executor task forever.
        if (n == 0) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (got < raw.length) return None
    val gray = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      val ft = raw(r * (width + 1)) & 0xff
      if (ft > 4) return None
      var c = 0
      while (c < width) {
        val f = raw(r * (width + 1) + 1 + c) & 0xff
        val left = if (c > 0) gray(r * width + c - 1) else 0
        val up = if (r > 0) gray((r - 1) * width + c) else 0
        val ul = if (r > 0 && c > 0) gray((r - 1) * width + c - 1) else 0
        val x = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 =>
            val pp = left + up - ul
            val (pa, pb, pc) = (math.abs(pp - left), math.abs(pp - up), math.abs(pp - ul))
            f + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        gray(r * width + c) = x & 0xff
        c += 1
      }
      r += 1
    }
    Some((width, height, gray))
  }

  /** 8×8 block-average perceptual hash (aHash) over decoded grayscale
    * pixels, returned as two 32-bit halves packed in LONGs (hi = blocks
    * 0-31, lo = blocks 32-63; block b maps to bit 31-(b mod 32), first
    * block most significant — the [[graft.ops.Similarity]] sign-bucket
    * convention). Two halves rather than one 64-bit word keep every
    * value positive and below 2^32, so the DuckDB oracle mirrors the
    * packing with no signed-overflow edge at bit 63.
    *
    * All INTEGER math (block mean = floor, global mean = floor, bit =
    * strictly-greater test), so the hash is bit-identical across
    * engines. Resolution-independent by construction: any width/height
    * that are multiples of 8 fold to the same 8×8 grid, so a clean k×
    * upscale of an image block-averages to the SAME hash — the resized
    * near-dup case exact payload hashing cannot see. */
  /** The shared 8×8 integer block grid both perceptual hashes fold
    * from: block (bi, bj) = floor mean of its (h/8)×(w/8) pixel tile. */
  private def blockGrid(gray: Array[Int], w: Int, h: Int): Array[Long] = {
    require(w % 8 == 0 && h % 8 == 0, "perceptual hashes fold dims that are multiples of 8")
    val bw = w / 8; val bh = h / 8
    val blocks = new Array[Long](64)
    var bi = 0
    while (bi < 8) {
      var bj = 0
      while (bj < 8) {
        var s = 0L
        var r = bi * bh
        while (r < (bi + 1) * bh) {
          var c = bj * bw
          while (c < (bj + 1) * bw) { s += gray(r * w + c); c += 1 }
          r += 1
        }
        blocks(bi * 8 + bj) = s / (bw.toLong * bh)
        bj += 1
      }
      bi += 1
    }
    blocks
  }

  /** Pack a 64-bit block predicate into two sub-2^32 halves (block b →
    * bit 31-(b mod 32) of half b/32, first block most significant). */
  private def packBits(bit: Int => Boolean): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var b = 0
    while (b < 64) {
      if (bit(b)) { if (b < 32) hi |= 1L << (31 - b) else lo |= 1L << (63 - b) }
      b += 1
    }
    (hi, lo)
  }

  def aHash64(gray: Array[Int], w: Int, h: Int): (Long, Long) =
    aHashOfBlocks(blockGrid(gray, w, h))

  /** The aHash bit rule over an already-folded block grid — split from
    * [[aHash64]] so the decode-once index build ([[imageHashesOf]])
    * can derive BOTH hash families from one grid fold. */
  private[ops] def aHashOfBlocks(blocks: Array[Long]): (Long, Long) = {
    val mean = blocks.sum / 64
    packBits(b => blocks(b) > mean)
  }

  /** Gradient (difference) hash over the SAME 8×8 block grid as
    * [[aHash64]]: bit (r, c) = block(r, c) > block(r, (c+1) mod 8) —
    * seven horizontal gradients per row plus the wrap-around pair, 64
    * bits. Why a second family: dHash depends only on the ORDER of
    * adjacent block values, so a monotonic tone mapping (gamma,
    * contrast curves, levels) that preserves the block-value order
    * leaves it bit-identical — exactly true when blocks are tonally
    * uniform (for mixed blocks Jensen's inequality can reorder two
    * AVERAGES, so the invariance is near-exact rather than absolute),
    * while aHash's block-vs-global-mean test flips under the same edit
    * regardless (the mean is never order-preserved through a
    * nonlinearity). Same resolution independence and integer-only
    * determinism as aHash. */
  def dHash64(gray: Array[Int], w: Int, h: Int): (Long, Long) =
    dHashOfBlocks(blockGrid(gray, w, h))

  /** The dHash bit rule over an already-folded block grid (see
    * [[aHashOfBlocks]]). */
  private[ops] def dHashOfBlocks(blocks: Array[Long]): (Long, Long) =
    packBits { b =>
      val r = b / 8; val c = b % 8
      blocks(r * 8 + c) > blocks(r * 8 + (c + 1) % 8)
    }

  /** Deterministic 16×16 grayscale pixel synthesis from document text:
    * pixel p = codePoint((p mod len)) mod 256 — the stand-in for the
    * missing image column, shared verbatim with the q121 oracle's
    * `unicode(text[i]) % 256` comprehension (code-POINT indexed on both
    * sides, the Winnow precedent for supplementary characters). */
  private[graft] def pixelsOf(text: String): Array[Int] = {
    val cps = text.codePoints().toArray
    Array.tabulate(256)(p => cps(p % cps.length) % 256)
  }

  /** Per-document perceptual hash relation (doc_id, hi, lo): synthesize
    * the 16×16 PNG with doc-VARIED encoder settings (filter type,
    * compression level, IDAT chunking — so byte-level equality is
    * destroyed even for identical pixels), then run the REAL decode and
    * aHash. The encode→decode round-trip is an identity on pixels, which
    * is what lets the DuckDB oracle compute the same hashes from the
    * pixel rule directly — the q71/q75 gate pattern: synthesis stands in
    * for the missing column, the decoder is the operator under test. */
  private[graft] def imageAHashOf(docs: DataFrame,
      hash: (Array[Int], Int, Int) => (Long, Long) = aHash64): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          // floorMod: `%` on a negative doc_id would hand Deflater a
          // negative filter/level and fail the whole job on one row
          val png = pngBytes(16, 16, pixelsOf(text),
            filterType = math.floorMod(id, 5).toInt,
            level = math.floorMod(id, 9).toInt + 1,
            chunk = if (math.floorMod(id, 2) == 0) Int.MaxValue else 64)
          val (w, h, gray) = pngDecode(png)
            .getOrElse(throw new IllegalStateException(s"unparseable PNG for doc $id"))
          val (hi, lo) = hash(gray, w, h)
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "hi", "lo")
  }

  /** BOTH perceptual hash families from ONE decode — the ingest pass
    * behind the persisted image-hash index ([[ImageIndex]]): at real
    * scale decoding is the single most expensive thing the pipeline
    * does and must happen once, so the per-doc artifact row carries the
    * aHash AND dHash derived from a single decode + block-grid fold.
    * Same synthesis front end as [[imageAHashOf]] (doc-varied PNG
    * encoder settings, real encode → real decode), so an artifact built
    * from this relation serves q121's and q125's oracles unchanged.
    * Output: (doc_id, a_hi, a_lo, d_hi, d_lo). */
  private[ops] def imageHashesOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val png = pngBytes(16, 16, pixelsOf(text),
            filterType = math.floorMod(id, 5).toInt,
            level = math.floorMod(id, 9).toInt + 1,
            chunk = if (math.floorMod(id, 2) == 0) Int.MaxValue else 64)
          val (w, h, gray) = pngDecode(png)
            .getOrElse(throw new IllegalStateException(s"unparseable PNG for doc $id"))
          val blocks = blockGrid(gray, w, h)
          val (ahi, alo) = aHashOfBlocks(blocks)
          val (dhi, dlo) = dHashOfBlocks(blocks)
          (id, ahi, alo, dhi, dlo)
        }
      }
      .toDF("doc_id", "a_hi", "a_lo", "d_hi", "d_lo")
  }

  /** q121: perceptual image near-dup pairs — the pixel-level rung the
    * exact-payload rung ([[frameDups]], q116) cannot reach: a
    * re-encoded, re-compressed, or cleanly resized duplicate image has
    * different BYTES but the same (or near-same) aHash. Candidates are
    * pairs sharing ≥1 of four 16-bit hash bands (the banded equi-join
    * discipline of the text ladder — cost ∝ collisions, never payload
    * pairs), hot bands are population-capped via the SAME guard as
    * MinHash ([[Dedup.capBands]] — a mass-duplicated logo would
    * otherwise go quadratic in one band), and candidates are verified
    * by exact 64-bit hamming distance ≤ `maxHamming`, computed inside
    * the join stage (hashes ride the band rows — the q95 discipline;
    * only survivors reach the distinct).
    *
    * Band soundness (pigeonhole): a pair within hamming ≤ 3 differs in
    * at most 3 of the 4 bands, so it shares at least one band —
    * candidate generation is EXACT (zero recall loss) at the default
    * maxHamming = 3; larger thresholds shade into the standard banded
    * approximation. */
  def perceptualDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBandPopulation: Int = 1000): DataFrame =
    perceptualDupsOfHashes(imageAHashOf(Tables.documents(spark, dir)),
      maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")

  /** q125: the GRADIENT family of the perceptual rung — q121's exact
    * pipeline with [[dHash64]] keys instead of [[aHash64]]. The two
    * families fail differently: aHash survives mean-preserving noise
    * that scrambles local gradients; dHash survives monotonic tone
    * edits (gamma, contrast) that move blocks relative to the global
    * mean. A production image-dedup rung runs both and unions
    * candidates — exactly how MinHash (q32) and SimHash (q35) coexist
    * on the text ladder. PerceptualDupsSpec plants a gamma-mapped
    * re-encode that q121 provably misses and q125 catches. */
  def perceptualDupsGradient(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBandPopulation: Int = 1000): DataFrame =
    perceptualDupsOfHashes(imageAHashOf(Tables.documents(spark, dir), dHash64),
      maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")

  /** Magic-byte image router: PNG signature → [[pngDecode]], JPEG SOI →
    * [[Jpeg.decode]], anything else → None. This is what makes the
    * perceptual rung format-blind: a crawl dedup keyed on decoded
    * PIXELS must not care which container carried them, or a PNG→JPEG
    * re-encode (the commonest image duplicate in the wild) slips
    * between per-format families. */
  def imageDecode(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (p.length < 2) None
    else if ((p(0) & 0xff) == 0x89 && p(1) == 'P') pngDecode(p)
    else if ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) Jpeg.decode(p)
    else if (p(0) == 'G' && p(1) == 'I') Gif.decode(p)
    else None

  /** The q121/q125 pipeline over DECODED payloads — drives the given
    * decoder (default: the [[imageDecode]] format router) on arbitrary
    * bytes; rows that fail to decode are dropped (the scan-phase skip,
    * not an error). Used by the planted re-encode/resize/tone-curve
    * specs, where byte-different payloads of the same pixels must land
    * in one bucket — and, with `pngDecode` passed explicitly, by the
    * spec that PROVES the PNG-only family misses a JPEG re-encode. */
  private[graft] def perceptualDupsOfPayloads(media: Dataset[MediaRecord],
      maxHamming: Int, maxBandPopulation: Int,
      hash: (Array[Int], Int, Int) => (Long, Long) = aHash64,
      decoder: Array[Byte] => Option[(Int, Int, Array[Int])] = imageDecode): DataFrame = {
    import media.sparkSession.implicits._
    val hashes = media
      .mapPartitions { batch =>
        batch.flatMap { r =>
          decoder(r.payload).collect {
            case (w, h, gray) if w % 8 == 0 && h % 8 == 0 =>
              val (hi, lo) = hash(gray, w, h)
              (r.doc_id, hi, lo)
          }
        }
      }
      .toDF("doc_id", "hi", "lo")
    perceptualDupsOfHashes(hashes, maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")
  }

  /** Deterministic 64×64 grayscale synthesis as 64 SOLID 8×8 tiles,
    * tile t = codePoint(t mod len) mod 256 — the cross-format variant
    * of [[pixelsOf]]. Solid-per-JPEG-block on purpose: a solid tile is
    * the class a baseline JPEG round-trips EXACTLY (all AC quantize to
    * zero; the DC path is exact when the DC quant step divides
    * 8·(v−128) — see [[Jpeg]]), so the encode→decode identity that
    * lets the q121 oracle compute hashes from the pixel rule holds for
    * the LOSSY codec too. Each aHash block (8×8 pixels of a 64×64
    * image) folds exactly one tile, so the hash is as rich as q121's —
    * 64 text-derived values — and band populations stay organic. */
  private[graft] def solidPixelsOf(text: String): Array[Int] = {
    val cps = text.codePoints().toArray
    val tiles = Array.tabulate(64)(t => cps(t % cps.length) % 256)
    Array.tabulate(64 * 64)(p => tiles((p / 64 / 8) * 8 + (p % 64) / 8))
  }

  /** q126: CROSS-FORMAT perceptual image dedup — the pair a per-format
    * family can never see. Even doc_ids write their pixels as PNG
    * (doc-varied filter/level/chunking), odd doc_ids as baseline JPEG
    * (doc-varied DC/AC quant, restart interval, comment segment) — so
    * every near-dup pair with one even and one odd member models the
    * commonest wild duplicate, a PNG→JPEG re-encode, and byte-level
    * equality is destroyed even for identical pixels WITHIN a format.
    * Both containers route through [[imageDecode]] to pixels, then the
    * q121 banded aHash pipeline. The oracle computes hashes from the
    * solid-tile rule directly: the PNG round trip is lossless and the
    * JPEG round trip is exact on the solid-tile class with the chosen
    * quant steps (1/2/4/8 all divide 8), so both engines agree by
    * construction — the q121 gate pattern extended through a LOSSY
    * codec. PerceptualDupsSpec plants a real PNG↔JPEG re-encode and
    * proves the PNG-only q121 family misses it while this rung and the
    * router pipeline catch it. */
  def crossFormatDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBandPopulation: Int = 1000): DataFrame = {
    import spark.implicits._
    val hashes = Tables.documents(spark, dir)
      .where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val px = solidPixelsOf(text)
          val payload =
            if (math.floorMod(id, 2) == 0)
              pngBytes(64, 64, px,
                filterType = math.floorMod(id, 5).toInt,
                level = math.floorMod(id, 9).toInt + 1,
                chunk = if (math.floorMod(id, 4) == 0) Int.MaxValue else 256)
            else
              Jpeg.jpegBytes(64, 64, px,
                dcQuant = 1 << math.floorMod(id, 4).toInt, // 1/2/4/8 all divide 8
                acQuant = 16 + math.floorMod(id, 7).toInt,
                restartInterval = math.floorMod(id, 3).toInt,
                comment = "re-encode pass " * math.floorMod(id, 3).toInt)
          val (w, h, gray) = imageDecode(payload)
            .getOrElse(throw new IllegalStateException(s"unparseable image for doc $id"))
          val (hi, lo) = aHash64(gray, w, h)
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "hi", "lo")
    perceptualDupsOfHashes(hashes, maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")
  }

  /** q132: the cross-format family widened to all THREE real codecs —
    * doc_id mod 3 picks the container (0 → PNG, 1 → baseline JPEG,
    * 2 → GIF), so the planted near-dup pairs include GIF↔PNG and
    * GIF↔JPEG re-encodes, the pairs [[crossFormatDups]]'s two-format
    * split can never produce and a GIF-blind router would drop
    * entirely (the q126 argument, third leg). Encoder knobs are
    * doc-varied per format (PNG filter/level/chunking, JPEG quant/
    * restart/comment, GIF sub-block size / periodic LZW clear /
    * interlace / comment) so byte equality is destroyed even within a
    * format. GIF is lossless and the JPEG solid-tile round trip exact,
    * so the oracle stays the q126 tile rule verbatim. */
  def crossFormatTrioDups(spark: SparkSession, dir: String,
      maxHamming: Int = 3, maxBandPopulation: Int = 1000): DataFrame = {
    import spark.implicits._
    val hashes = Tables.documents(spark, dir)
      .where(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { batch =>
        batch.map { case (id, text) =>
          val px = solidPixelsOf(text)
          val payload = (math.floorMod(id, 3): @unchecked) match {
            case 0 =>
              pngBytes(64, 64, px,
                filterType = math.floorMod(id, 5).toInt,
                level = math.floorMod(id, 9).toInt + 1,
                chunk = if (math.floorMod(id, 4) == 0) Int.MaxValue else 256)
            case 1 =>
              Jpeg.jpegBytes(64, 64, px,
                dcQuant = 1 << math.floorMod(id, 4).toInt,
                acQuant = 16 + math.floorMod(id, 7).toInt,
                restartInterval = math.floorMod(id, 3).toInt,
                comment = "re-encode pass " * math.floorMod(id, 3).toInt)
            case 2 =>
              Gif.gifBytes(64, 64, px,
                chunk = if (math.floorMod(id, 4) == 0) 255 else 64,
                clearEvery = math.floorMod(id, 3).toInt * 200,
                interlace = math.floorMod(id, 2) == 0,
                comment = "gif re-encode " * math.floorMod(id, 3).toInt)
          }
          val (w, h, gray) = imageDecode(payload)
            .getOrElse(throw new IllegalStateException(s"unparseable image for doc $id"))
          val (hi, lo) = aHash64(gray, w, h)
          (id, hi, lo)
        }
      }
      .toDF("doc_id", "hi", "lo")
    perceptualDupsOfHashes(hashes, maxHamming, maxBandPopulation)
      .orderBy("doc_a", "doc_b")
  }

  /** The 4×16-bit banding over a (doc_id, hi, lo) perceptual-hash
    * relation — factored out so the BATCH pair stage and the STREAMING
    * ingest gate ([[graft.streaming.DocumentsStreaming
    * .imageDupCandidates]]) can never key differently, exactly as
    * [[Dedup.bandsOf]] is shared by the text ladder's two sides. */
  private[graft] def perceptualBands(hashes: DataFrame): DataFrame =
    // star-select: every input column rides along (the streaming gate
    // carries an event-time ts the batch relations don't have)
    hashes.select(col("*"),
      posexplode(array(
        shiftright(col("hi"), 16), col("hi").bitwiseAND(lit(65535L)),
        shiftright(col("lo"), 16), col("lo").bitwiseAND(lit(65535L))))
        .as(Seq("band", "band_key")))

  /** Static perceptual band-key index of the corpus — what an image
    * INGEST gate probes ("does this arriving image share an aHash band
    * with anything we hold"), mirroring [[Dedup.bandIndex]] for text.
    * ≤ 4·|docs| short rows, distinct. */
  def perceptualBandIndex(spark: SparkSession, dir: String): DataFrame =
    perceptualBands(imageAHashOf(Tables.documents(spark, dir)))
      .select("band", "band_key").distinct()

  /** Band + verify over a (doc_id, hi, lo) hash relation: four 16-bit
    * bands per hash, capped, self equi-joined, hamming-verified in the
    * join stage. */
  private[ops] def perceptualDupsOfHashes(hashes: DataFrame,
      maxHamming: Int, maxBandPopulation: Int): DataFrame = {
    val capped = Dedup.capBands(perceptualBands(hashes), maxBandPopulation)
    capped.as("a")
      .join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(col("a.hi").bitwiseXOR(col("b.hi"))) +
          bit_count(col("a.lo").bitwiseXOR(col("b.lo")))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Frame sampling: the 1→N decode shape (one video payload → many frame
    * rows). The STUB samples one "frame" per 100 bytes of payload with a
    * deterministic content hash; a real build swaps the frame expression
    * for a codec call inside mapPartitions. Built with
    * `posexplode(sequence(...))` so the expansion happens inside codegen —
    * no driver loop, no UDF, and the explode parallelizes across the
    * spread partitions. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        // greatest(n,1): an empty payload still yields one frame row on
        // both engines (Spark div truncates toward zero, DuckDB //
        // floors - they disagree at -1)
        posexplode(sequence(lit(0L), expr("(greatest(n_bytes, 1) - 1) div 100"))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_idx"),
        // stub frame content hash: offset arithmetic on the byte stream
        ((col("doc_id") * 1000003L + col("col") * 7919L) % 1000000007L).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")
  }
}
