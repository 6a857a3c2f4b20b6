package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scratch (not part of the default gate): isolate converter throughput
  * components on a large generated CSV. Run explicitly:
  *   sbt "testOnly graft.core.ThroughputScratchSpec"
  * Skips silently when /tmp/lineitem_big.csv is absent. */
class ThroughputScratchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val big = "/tmp/lineitem_big.csv"

  test("throughput breakdown: parse-only vs parse+cast vs parse+cast+write") {
    assume(new java.io.File(big).exists(), s"$big not present")
    val mb = new java.io.File(big).length / 1024.0 / 1024.0
    // shrink split size for this spec only; restore on exit so the shared
    // session doesn't leak the setting into later suites
    val prevSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
    try runBreakdown(mb)
    finally prevSplit match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("codec/dictionary sweep: parquet write throughput on the big CSV") {
    assume(new java.io.File(big).exists(), s"$big not present")
    val mb = new java.io.File(big).length / 1024.0 / 1024.0
    val prevSplit = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
    try {
      val schema = Inference.detectFile(spark, big, ',', 100)
      val cast = Converter.conversionPlan(spark, big, schema, ',', multiLine = false)
      cast.count() // warm the scan path so the first codec isn't penalized
      val variants = Seq(
        ("snappy", true), ("snappy", false),
        ("zstd", true), ("zstd", false),
        ("lz4", true), ("uncompressed", true))
      variants.foreach { case (codec, dict) =>
        val out = s"/tmp/scratch_codec_${codec}_$dict.parquet"
        val t0 = System.nanoTime()
        cast.write.mode("overwrite")
          .option("compression", codec)
          .option("parquet.enable.dictionary", dict.toString)
          .parquet(out)
        val s = (System.nanoTime() - t0) / 1e9
        val outMb = graft.TestSpark.dirBytes(new java.io.File(out)) / 1024.0 / 1024.0
        info(f"$codec dict=$dict: $s%.1fs  (${mb / s}%.1f MiB/s in, $outMb%.0f MiB out)")
      }
    } finally prevSplit match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  private def runBreakdown(mb: Double): Unit = {
    val schema = Inference.detectFile(spark, big, ',', 100)

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      info(f"$label: $s%.1fs  (${mb / s}%.1f MiB/s)")
    }

    val raw = spark.read
      .option("header", "true").option("enforceSchema", "true")
      .option("mode", "DROPMALFORMED").option("nullValue", "")
      .schema(schema.rawSchema).csv(big)
    timed("parse only (count)") { raw.count(); () }
    val cast = Converter.conversionPlan(spark, big, schema, ',', multiLine = false)
    timed("parse+GoCast (count)") { cast.count(); () }
    timed("parse+GoCast+parquet write") {
      cast.write.mode("overwrite").parquet("/tmp/scratch_out.parquet")
    }
    timed("plain Spark cast (count)") {
      raw.selectExpr(schema.headers.map(h => s"cast(`$h` as string)"): _*).count(); ()
    }
  }
}
