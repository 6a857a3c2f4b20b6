package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.{Converter, GraftConfig}

/** CLI entry point mirroring the reference's main (main.go:13-59):
  * config layering → convert → summary → exit code 1 on any failure.
  *
  * Usage: graft.cli.Main --input <file-or-dir> [--output dir]
  *        [--delimiter ,] [--sample-rows 100] [--batch-size 10000]
  *        [--config config.yaml] [--log-level info] [--keep]
  *        [--format csv|json] [--sink parquet|orc|json]
  *        [--codec snappy|gzip|zstd|lz4|uncompressed]
  *        [--dir-output] [--no-multiline] [--multiline]
  *        [--partition-by col1,col2] [--json-sampling-ratio 0.01]
  */
object Main {
  def main(args: Array[String]): Unit = {
    GraftConfig.load(args.toSeq) match {
      case Left(err) =>
        System.err.println(s"[graft] error: $err")
        sys.exit(2)
      case Right(cfg) =>
        val builder = SparkSession.builder()
          .appName("graft-csv-to-parquet")
          .config("spark.sql.session.timeZone", "UTC")
          // conversion is a scan→cast→write pipeline with no shuffle, so
          // split width IS the parallelism; 32 MB splits keep a mid-size
          // file busy on every core (default 128 MB gives a 150 MB file
          // just two tasks). Effective whenever the scan is line-based —
          // the default since the multiLine sniff (a newline-free sample
          // picks the splittable scan; --multiline forces parity mode).
          .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
        // under spark-submit the master comes from the launcher; standalone
        // CLI runs default to all local cores
        val spark = (if (sys.props.contains("spark.master")) builder
                     else builder.master("local[*]")).getOrCreate()
        spark.sparkContext.setLogLevel(cfg.logLevel.toUpperCase match {
          case l @ ("DEBUG" | "INFO" | "WARN" | "ERROR") => l
          case _ => "INFO" // bad level falls back to info (main.go:22-25)
        })
        val summary = Converter.convertAll(spark, cfg)
        summary.results.foreach { r =>
          val status = r.error.map(e => s"FAILED: $e").getOrElse("ok")
          println(f"[graft] ${r.inputFile} -> ${r.outputFile} [$status]")
        }
        println(f"[graft] converted=${summary.converted} failed=${summary.failed} " +
          f"in=${summary.inputBytes / 1024.0 / 1024.0}%.2fMB out=${summary.outputBytes / 1024.0 / 1024.0}%.2fMB " +
          f"saved=${summary.savedBytes / 1024.0 / 1024.0}%.2fMB")
        spark.stop()
        sys.exit(summary.exitCode)
    }
  }
}
