package graft.core

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

/** Inferred schema for one CSV file. */
final case class InferredSchema(headers: Seq[String], types: Seq[FieldType]) {
  /** All reference fields are OPTIONAL, i.e. nullable
    * (converter/converter.go:308). */
  def sparkSchema: StructType =
    StructType(headers.zip(types).map { case (h, t) => StructField(h, t.sparkType, nullable = true) })
  /** Schema for the raw string read (pass 2 reads everything as string and
    * casts with reference semantics — see Converter). */
  def rawSchema: StructType =
    StructType(headers.map(h => StructField(h, org.apache.spark.sql.types.StringType, nullable = true)))
}

/** Sample-based schema inference, mirroring `detectSchema`
  * (converter/converter.go:185-239):
  *
  *  1. read + normalize the header row;
  *  2. start every column optimistically at INT64;
  *  3. fold `widen ∘ infer` over the first `sampleRows` records, skipping
  *     exactly-empty cells ("skip empty — don't downgrade type") and cells
  *     beyond the header width;
  *  4. ragged records (field count != header count) are skipped — Go's
  *     csv.Reader locks FieldsPerRecord to the header width after the
  *     first Read, so every subsequent ragged row surfaces as an error and
  *     the sampling loop `continue`s past it (converter/converter.go:224-226).
  *
  * This is a deliberate driver-side prefix read (reference "pass 1"): it
  * touches only the first `sampleRows` records of the file regardless of
  * file size, so it scales to arbitrarily large inputs. Spark's own
  * `inferSchema` is NOT used — it samples differently (whole file or a
  * ratio), uses a different lattice, and infers native date/timestamp
  * types (SURVEY.md §1.3).
  */
object Inference {

  /** Pure fold used by both the file-based entry point and tests. The
    * iterator must yield data records (header already consumed). */
  def detect(headerRow: Seq[String], records: Iterator[Array[String]], sampleRows: Int): InferredSchema = {
    val headers = Normalize.headers(headerRow)
    val types = Array.fill[FieldType](headers.length)(FieldType.TInt64) // start optimistic
    var sampled = 0
    while (sampled < sampleRows && records.hasNext) {
      val rec = records.next()
      // Go csv.Reader: FieldsPerRecord is locked to the header width; a
      // ragged row is returned with ErrFieldCount and the sampler skips it.
      if (rec.length == headers.length) {
        var i = 0
        val n = math.min(rec.length, types.length)
        while (i < n) {
          val v = rec(i)
          if (v != null && v.nonEmpty) // skip empty — don't downgrade type
            types(i) = FieldType.widen(types(i), FieldType.infer(v))
          i += 1
        }
      }
      sampled += 1
    }
    InferredSchema(headers, types.toSeq)
  }

  /** Open `path` (any Hadoop-visible filesystem), read the header and up to
    * `sampleRows` records through the lazy-quote CSV reader, and infer. */
  def detectFile(spark: SparkSession, path: String, delimiter: Char, sampleRows: Int): InferredSchema =
    detectFileStats(spark, path, delimiter, sampleRows)._1

  /** [[detectFile]] plus a fact the converter wants from the SAME prefix
    * read: did any sampled field (header included) carry an embedded
    * newline? Quoted newlines force Spark's multiLine CSV mode, which
    * makes the scan non-splittable (one task per file, whatever the
    * size); a newline-free sample lets the converter keep the splittable
    * line-based scan. No extra IO — the sniff rides the records the
    * inference fold was reading anyway. */
  def detectFileStats(spark: SparkSession, path: String, delimiter: Char,
      sampleRows: Int): (InferredSchema, Boolean) = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(hadoopConf(spark))
    val in = new BufferedReader(new InputStreamReader(fs.open(hPath), StandardCharsets.UTF_8))
    try {
      val csv = new LazyCsv(in, delimiter)
      if (!csv.hasNext) throw new IllegalArgumentException(s"empty CSV: $path")
      val header = csv.next().toSeq
      def hasNewline(fields: Iterable[String]): Boolean =
        fields.exists(f => f != null && (f.indexOf('\n') >= 0 || f.indexOf('\r') >= 0))
      var sawNewline = hasNewline(header)
      val watched = csv.map { rec =>
        if (!sawNewline && hasNewline(rec)) sawNewline = true
        rec
      }
      val schema = detect(header, watched, sampleRows)
      (schema, sawNewline)
    } finally in.close()
  }

  /** Distributed batch inference: infer every file's schema in ONE Spark
    * job — the file list is parallelized and each task runs the same
    * prefix-read fold [[detectFile]] runs, on an executor. Per-file
    * sampling semantics are bit-identical to the sequential path (same
    * LazyCsv reader, same fold); only the scheduling changes. A
    * sequential driver loop costs I/O-latency × files with zero overlap —
    * at crawl-scale file counts (10⁴–10⁶ CSVs) that is a driver
    * bottleneck, while one job of prefix-reads scales with the executor
    * count. Results collect to the driver: N schemas is O(columns)
    * metadata, the legitimate driver-side payload. */
  def detectFiles(spark: SparkSession, paths: Seq[String], delimiter: Char,
      sampleRows: Int): Map[String, InferredSchema] = {
    if (paths.isEmpty) return Map.empty
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf(spark)))
    val delim = delimiter
    val n = sampleRows
    // one partition per file up to the default parallelism: tasks are
    // I/O-bound prefix reads, so finer slicing just buys scheduler overhead
    val slices = math.max(1, math.min(paths.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(paths, slices)
      .map { p =>
        val hPath = new Path(p)
        val fs = hPath.getFileSystem(confBc.value.value)
        val in = new BufferedReader(new InputStreamReader(fs.open(hPath), StandardCharsets.UTF_8))
        try {
          val csv = new LazyCsv(in, delim)
          if (!csv.hasNext) throw new IllegalArgumentException(s"empty CSV: $p")
          val header = csv.next().toSeq
          p -> detect(header, csv, n)
        } finally in.close()
      }
      .collect()
      .toMap
  }

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(hadoopConf(spark))
}
