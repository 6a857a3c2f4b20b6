package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Converter configuration, mirroring the reference's 7 flat keys and
  * layering rules (config/config.go:12-85): defaults ← YAML ← CLI flags.
  *
  * Deviations (documented, SURVEY.md §7.4.5): `deleteOriginal` defaults to
  * FALSE here (the reference defaults to true — a destructive default is
  * wrong for a library); the CLI sets it true for parity mode unless
  * `--keep` is passed.
  */
final case class GraftConfig(
    input: String = "",
    output: String = "",
    delimiter: String = ",",
    sampleRows: Int = 100,
    /** Debug progress-tick cadence: a log line every `batchSize` rows
      * per conversion task at `--log-level debug` (reference O18,
      * converter.go:365-367). Quirk Q3: the reference README claims this
      * sets the parquet row-group size; its code only uses it for the
      * log cadence — we implement what the code does. */
    batchSize: Int = 10000,
    deleteOriginal: Boolean = false,
    logLevel: String = "info",
    /** Source format: "csv" (reference parity) or "json" (JSON-lines
      * extension). */
    format: String = "csv",
    /** Parquet compression codec (snappy = reference default; zstd
      * trades CPU for ratio at scale). */
    codec: String = "snappy",
    /** Sink format: "parquet" (reference parity), or the "orc"/"json"
      * extensions (same inference + cast pipeline, different writer). */
    sink: String = "parquet",
    /** Write a single `<base>.parquet` file like the reference (coalesce(1)
      * + rename). Disable for large inputs to keep parallel output. */
    singleFile: Boolean = true,
    /** Support embedded newlines in quoted CSV fields (Go encoding/csv
      * semantics). Costs splittability: a multiLine file is ONE scan task.
      * Disable (`--no-multiline`) when fields are newline-free to let
      * Spark split large files across tasks. */
    multiLine: Boolean = true,
    /** Let the converter downgrade to the splittable line-based scan when
      * the inference sample (header + `sampleRows` records) contains no
      * embedded newline — the single biggest lever on one-big-file
      * conversion, which is otherwise a single non-splittable task.
      * Heuristic caveat: a quoted newline appearing only AFTER the sample
      * would split into ragged fragments that DROPMALFORMED discards;
      * `--multiline` forces the Go-parity scan for files known to carry
      * late embedded newlines. Ignored when `multiLine` is false. */
    multiLineAuto: Boolean = true,
    /** Comma-separated columns (post-normalization names) to partition
      * the output by (hive-style `col=value/` directories → partition
      * pruning downstream). Requires directory output. */
    partitionBy: String = "",
    /** Fraction of a JSON-lines input read for STRUCTURAL schema
      * inference (which keys exist / nesting) — 1.0 scans the whole
      * file; lower it for huge inputs to make the inference pass
      * O(sample) like the CSV path. Deterministic (fixed-seed sample);
      * the value-type lattice reads only `sampleRows` rows regardless.
      * JSON format only. */
    jsonSamplingRatio: Double = 1.0) {

  /** Parsed partition column list. */
  def partitionCols: Seq[String] =
    partitionBy.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** First character of the delimiter, after unescaping `\t`-style escapes.
    * The reference silently uses only the first byte
    * (converter/converter.go:127-130); we accept common escapes first. */
  def delimiterChar: Char = GraftConfig.delimiterChar(delimiter)
}

object GraftConfig {

  private val KnownFlags = Set(
    "input", "output", "delimiter", "sample-rows", "batch-size", "config", "log-level",
    "format", "codec", "sink", "partition-by", "json-sampling-ratio")

  private val KnownCodecs = Set("snappy", "gzip", "zstd", "lz4", "uncompressed")

  private val KnownSinks = Set("parquet", "orc", "json")

  def delimiterChar(d: String): Char = d match {
    case null | ""  => ','
    case "\\t"      => '\t'
    case "\\n"      => '\n'
    case "\\r"      => '\r'
    case s          => s.charAt(0)
  }

  /** Hand-rolled parser for the reference's flat YAML config — 7 scalar
    * keys, no nesting (config.yaml has exactly `input, output, delimiter,
    * sample_rows, batch_size, delete_original, log_level`). Keeping this
    * dependency-free matches the offline build constraint. */
  /** Strip a trailing comment, but never inside a quoted value (the
    * naive takeWhile('#') would mangle `delimiter: "#"` and paths
    * containing '#'). */
  private def stripComment(line: String): String = {
    var inQuote = '\u0000'
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote != '\u0000') { if (c == inQuote) inQuote = '\u0000' }
      else if (c == '"' || c == '\'') inQuote = c
      else if (c == '#') return line.substring(0, i)
      i += 1
    }
    line
  }

  def parseYaml(text: String): Map[String, String] =
    text.linesIterator
      .map(l => stripComment(l).trim)
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val idx = l.indexOf(':')
        val k = l.substring(0, idx).trim
        var v = l.substring(idx + 1).trim
        if (v.length >= 2 && ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        k -> v
      }
      .toMap

  /** Apply YAML values over `base`. Unknown keys are ignored; malformed
    * numbers keep the previous value (the reference's yaml lib would error;
    * we choose leniency and log upstream). */
  def fromYaml(base: GraftConfig, text: String): GraftConfig = {
    val kv = parseYaml(text)
    def int(k: String, cur: Int) = kv.get(k).flatMap(v => v.toIntOption).getOrElse(cur)
    def bool(k: String, cur: Boolean) = kv.get(k).map(_.equalsIgnoreCase("true")).getOrElse(cur)
    base.copy(
      input = kv.getOrElse("input", base.input),
      output = kv.getOrElse("output", base.output),
      delimiter = kv.getOrElse("delimiter", base.delimiter),
      sampleRows = int("sample_rows", base.sampleRows),
      batchSize = int("batch_size", base.batchSize),
      deleteOriginal = bool("delete_original", base.deleteOriginal),
      logLevel = kv.getOrElse("log_level", base.logLevel))
  }

  /** CLI flag parse + layering, mirroring config.Load (config/config.go:22-85):
    *  - defaults; then `--config` YAML (missing default file is OK, missing
    *    *explicit* file is fatal); then flags, where only non-empty /
    *    positive values override (quirk Q7: `--batch-size 0` and
    *    `--sample-rows 0` cannot override) and `--keep` can only force
    *    keep, never force delete.
    */
  def load(args: Seq[String]): Either[String, GraftConfig] = {
    val flags = scala.collection.mutable.Map.empty[String, String]
    var keep = false
    var dirOutput = false
    var noMultiline = false
    var forceMultiline = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--keep" => keep = true; i += 1
        case "--dir-output" => dirOutput = true; i += 1
        case "--no-multiline" => noMultiline = true; i += 1
        case "--multiline" => forceMultiline = true; i += 1
        case flag if flag.startsWith("--") =>
          val key = flag.stripPrefix("--")
          if (!KnownFlags.contains(key)) return Left(s"unknown flag: $flag")
          if (i + 1 >= args.length) return Left(s"missing value for $flag")
          flags(key) = args(i + 1); i += 2
        case other => return Left(s"unexpected argument: $other")
      }
      ()
    }

    // reference parity: CLI mode deletes originals by default (config.go:25)
    var cfg = GraftConfig(deleteOriginal = true)

    flags.get("config") match {
      case Some(path) =>
        if (!Files.exists(Paths.get(path))) return Left(s"config file not found: $path")
        cfg = fromYaml(cfg, Files.readAllLines(Paths.get(path)).asScala.mkString("\n"))
      case None =>
        val default = Paths.get("config.yaml")
        if (Files.exists(default))
          cfg = fromYaml(cfg, Files.readAllLines(default).asScala.mkString("\n"))
    }

    flags.get("input").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(input = v))
    flags.get("output").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(output = v))
    flags.get("delimiter").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(delimiter = v))
    flags.get("sample-rows").flatMap(_.toIntOption).filter(_ > 0).foreach(v => cfg = cfg.copy(sampleRows = v))
    flags.get("batch-size").flatMap(_.toIntOption).filter(_ > 0).foreach(v => cfg = cfg.copy(batchSize = v))
    flags.get("log-level").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(logLevel = v))
    flags.get("format").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(format = v))
    flags.get("codec").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(codec = v))
    flags.get("sink").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(sink = v))
    flags.get("partition-by").filter(_.nonEmpty).foreach(v => cfg = cfg.copy(partitionBy = v))
    flags.get("json-sampling-ratio").foreach { v =>
      v.toDoubleOption match {
        case Some(r) if r > 0.0 && r <= 1.0 => cfg = cfg.copy(jsonSamplingRatio = r)
        case _ => return Left(s"--json-sampling-ratio must be in (0, 1], got: $v")
      }
    }
    if (keep) cfg = cfg.copy(deleteOriginal = false) // --keep only forces keep
    if (dirOutput || cfg.partitionCols.nonEmpty) cfg = cfg.copy(singleFile = false)
    if (noMultiline && forceMultiline) return Left("--multiline and --no-multiline conflict")
    if (noMultiline) cfg = cfg.copy(multiLine = false)
    if (forceMultiline) cfg = cfg.copy(multiLine = true, multiLineAuto = false)

    if (cfg.input.isEmpty) Left("input is required (--input or config file)")
    else if (cfg.format != "csv" && cfg.format != "json")
      Left(s"unsupported format: ${cfg.format} (expected csv or json)")
    else if (!KnownCodecs.contains(cfg.codec))
      Left(s"unsupported codec: ${cfg.codec} (expected ${KnownCodecs.toSeq.sorted.mkString("/")})")
    else if (!KnownSinks.contains(cfg.sink))
      Left(s"unsupported sink: ${cfg.sink} (expected ${KnownSinks.toSeq.sorted.mkString("/")})")
    else if (cfg.sink == "orc" && cfg.codec == "gzip")
      Left("codec gzip is not supported by the orc sink (use snappy/zstd/lz4/uncompressed)")
    else Right(cfg)
  }
}
