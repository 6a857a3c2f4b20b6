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
