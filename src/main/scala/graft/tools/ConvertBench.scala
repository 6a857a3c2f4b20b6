package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Converter, Inference}

/** Converter throughput probe — separates the real cost centers of the
  * CSV→parquet pipeline on a large fixture:
  *
  *   sbt "runMain graft.tools.ConvertBench /tmp/lineitem_big.csv"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ConvertBench ..."
  *
  * Why a dedicated probe: `count()` on a CSV scan short-circuits field
  * parsing (Catalyst prunes every column, the parser only finds record
  * boundaries), so naive "parse-only" timings overstate parse throughput
  * by ~10x. The `noop` sink here materializes EVERY field through the
  * full parse + GoCast projection without any encode/IO, which is the
  * honest baseline to compare parquet codecs against.
  */
object ConvertBench {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse("/tmp/lineitem_big.csv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mb = new java.io.File(input).length / 1024.0 / 1024.0

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[convertbench] cores=$cpus%s $label: $s%.1fs (${mb / s}%.1f MiB/s)")
    }

    val schema = Inference.detectFile(spark, input, ',', 100)
    val cast = Converter.conversionPlan(spark, input, schema, ',', multiLine = false)
    timed("record-boundary scan (count, fields pruned)") { cast.count(); () }
    timed("full parse+cast, no sink (noop)") {
      cast.write.format("noop").mode("overwrite").save()
    }
    // isolate the parser-config cost: same scan minus the LazyQuotes /
    // RFC-doubled-quote options the reference semantics require
    timed("full parse default quote opts, no cast, no sink (noop)") {
      spark.read.option("header", "true").option("enforceSchema", "true")
        .option("mode", "DROPMALFORMED").option("nullValue", "")
        .schema(schema.rawSchema).csv(input)
        .write.format("noop").mode("overwrite").save()
    }
    timed("full parse reference quote opts, no cast, no sink (noop)") {
      Converter.rawStringPlan(spark, input, schema, ',', multiLine = false)
        .write.format("noop").mode("overwrite").save()
    }
    Seq("snappy", "lz4", "zstd").foreach { codec =>
      timed(s"full pipeline -> parquet/$codec") {
        cast.write.mode("overwrite").option("compression", codec)
          .parquet(s"/tmp/convertbench_$codec.parquet")
      }
    }
    spark.stop()
  }
}
