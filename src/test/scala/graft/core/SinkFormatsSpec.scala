package graft.core

import java.nio.file.{Files, Path => JPath}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The sink-format extension: the reference writes only Parquet
  * (converter/converter.go:314-378); graft adds ORC and JSON-lines sinks
  * sharing the exact same inference + GoCast pipeline — only the writer
  * differs, so the typed values must round-trip identically across all
  * three. */
class SinkFormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val csv = "id,score,name\n1,3.5,alice\n2,4,bob\n3,,carol\n"
  private val expectedSchema = StructType(Seq(
    StructField("id", LongType, true),
    StructField("score", DoubleType, true),
    StructField("name", StringType, true)))

  private def convert(sink: String, singleFile: Boolean = true): String = {
    val dir: JPath = Files.createTempDirectory(s"graft-sink-$sink")
    val in = dir.resolve("t.csv")
    Files.write(in, csv.getBytes(StandardCharsets.UTF_8))
    val cfg = GraftConfig(output = dir.resolve("out").toString,
      deleteOriginal = false, sink = sink, singleFile = singleFile)
    val r = Converter.convertFile(spark, in.toString, cfg)
    assert(r.ok, r.error)
    assert(r.outputFile.endsWith("." + sink), r.outputFile)
    r.outputFile
  }

  test("orc sink: single .orc file, same schema and values as parquet") {
    val out = convert("orc")
    assert(new java.io.File(out).isFile)
    val df = spark.read.orc(out)
    assert(df.schema == expectedSchema)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getDouble(1) == 4.0 && rows(2).isNullAt(1))
    assert(rows(0).getString(2) == "alice")
  }

  test("json sink: typed values survive the round-trip") {
    val out = convert("json")
    val df = spark.read
      .schema(expectedSchema) // pin types: JSON inference would re-guess
      .json(out)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(1) == 3.5 && rows(2).isNullAt(1))
  }

  test("orc sink: directory mode for parallel output at scale") {
    val out = convert("orc", singleFile = false)
    assert(new java.io.File(out).isDirectory)
    assert(spark.read.orc(out).count() == 3)
  }

  test("config rejects an unknown sink and the orc+gzip combination") {
    assert(GraftConfig.load(Seq("--input", "x.csv", "--sink", "avro")).isLeft)
    assert(GraftConfig.load(Seq("--input", "x.csv", "--sink", "orc", "--codec", "gzip")).isLeft)
    assert(GraftConfig.load(Seq("--input", "x.csv", "--sink", "orc", "--codec", "zstd")).isRight)
  }

  test("--dir-output and --no-multiline set the scale-path options") {
    val cfg = GraftConfig.load(Seq("--input", "x.csv", "--dir-output", "--no-multiline"))
      .fold(e => fail(e), identity)
    assert(!cfg.singleFile && !cfg.multiLine)
    val defaults = GraftConfig.load(Seq("--input", "x.csv")).fold(e => fail(e), identity)
    assert(defaults.singleFile && defaults.multiLine)
  }

  test("--partition-by writes hive-style partitions (and implies dir output)") {
    val cfg = GraftConfig.load(Seq("--input", "x.csv", "--partition-by", "name"))
      .fold(e => fail(e), identity)
    assert(!cfg.singleFile && cfg.partitionCols == Seq("name"))

    val dir: JPath = Files.createTempDirectory("graft-part")
    val in = dir.resolve("t.csv")
    Files.write(in, csv.getBytes(StandardCharsets.UTF_8))
    val r = Converter.convertFile(spark, in.toString,
      GraftConfig(output = dir.resolve("out").toString, deleteOriginal = false,
        singleFile = false, partitionBy = "name"))
    assert(r.ok, r.error)
    val sub = new java.io.File(r.outputFile).listFiles().map(_.getName).filter(_.startsWith("name="))
    assert(sub.toSet == Set("name=alice", "name=bob", "name=carol"), sub.toSeq)
    val back = spark.read.parquet(r.outputFile)
    assert(back.count() == 3 && back.columns.toSet == Set("id", "score", "name"))
  }

  test("partition-by with a nonexistent column reports an error, not a crash") {
    val dir: JPath = Files.createTempDirectory("graft-partbad")
    val in = dir.resolve("t.csv")
    Files.write(in, csv.getBytes(StandardCharsets.UTF_8))
    val r = Converter.convertFile(spark, in.toString,
      GraftConfig(output = dir.resolve("out").toString, deleteOriginal = false,
        singleFile = false, partitionBy = "no_such_col"))
    assert(!r.ok && r.error.nonEmpty)
    assert(Files.exists(in), "source must survive a failed conversion")
  }

  test("no-multiline scan converts newline-free files identically") {
    val dir: JPath = Files.createTempDirectory("graft-noml")
    val in = dir.resolve("t.csv")
    Files.write(in, csv.getBytes(StandardCharsets.UTF_8))
    val cfg = GraftConfig(output = dir.resolve("out").toString,
      deleteOriginal = false, multiLine = false)
    val r = Converter.convertFile(spark, in.toString, cfg)
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    assert(df.schema == expectedSchema)
    assert(df.count() == 3)
  }
}
