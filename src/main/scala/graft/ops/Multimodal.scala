package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One record of opaque media: typed metadata + the raw bytes. In a real
  * pipeline `payload` holds an encoded image/audio/video blob; here the
  * documents' UTF-8 bytes stand in (the container has no media columns or
  * codec libraries). */
final case class MediaRecord(doc_id: Long, payload: Array[Byte])

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

  /** STUB — deterministic fake decode. A production build replaces this
    * body with a real codec call (e.g. JPEG header parse + pixel stats);
    * everything around it keeps working because the contract is just
    * bytes → metadata. */
  def stubDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val w = math.max(n % 640, 1)
    val h = math.max((n * 7) % 480, 1)
    // resize stub: fit into a 224x224 box preserving aspect ratio,
    // integer-only math (floor division) so every engine agrees
    val (rw, rh) =
      if (w >= h) (224L, math.max(h * 224 / w, 1))
      else (math.max(w * 224 / h, 1), 224L)
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

  /** Typed decode pipeline over the documents' bytes. */
  def decode(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        // per-partition init would go here (codec handles, model weights)
        batch.map(r => stubDecode(r.payload).copy(doc_id = r.doc_id))
      }
  }

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    decode(spark, dir).toDF().orderBy("doc_id")

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
