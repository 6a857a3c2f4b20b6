package graft.core

import java.nio.file.{Files, Path => JPath}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end golden tests for the converter (FIXTURES.md §2). Each case
  * pins a cited reference behavior: conversion writes a real single
  * `.parquet` FILE whose schema and contents match the reference
  * semantics.
  */
class ConverterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): JPath = Files.createTempDirectory("graft-conv")
  private def writeCsv(dir: JPath, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }
  private def cfg(dir: JPath): GraftConfig =
    GraftConfig(output = dir.resolve("out").toString, deleteOriginal = false)

  test("types_basic: inference lattice + typed parquet output (FIXTURES §2.1)") {
    val dir = tmpDir()
    val in = writeCsv(dir, "types_basic.csv",
      "id,score,active,name,joined\n1,3.5,true,alice,2021-01-02\n2,4,false,bob,2021-02-03\n")
    val r = Converter.convertFile(spark, in, cfg(dir))
    assert(r.ok, r.error)
    // single FILE, reference contract (converter.go:107-114)
    assert(new java.io.File(r.outputFile).isFile)
    val df = spark.read.parquet(r.outputFile)
    // NOTE: `active` is STRING, not BOOLEAN — faithful to the reference,
    // where widen(INT64-init, BOOL) = STRING makes bool columns
    // unreachable (see FieldType.widen scaladoc).
    assert(df.schema == StructType(Seq(
      StructField("id", LongType, true),
      StructField("score", DoubleType, true),
      StructField("active", StringType, true),
      StructField("name", StringType, true),
      StructField("joined", StringType, true)))) // dates stay strings
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 3.5 &&
      rows(0).getString(2) == "true" && rows(0).getString(3) == "alice" &&
      rows(0).getString(4) == "2021-01-02")
  }

  test("dirty headers: BOM, spaces, dots, empties (FIXTURES §2.2)") {
    val dir = tmpDir()
    val in = writeCsv(dir, "headers_dirty.csv",
      "\uFEFFFirst Name, tax.rate ,\nalice,0.2,x\n")
    val r = Converter.convertFile(spark, in, cfg(dir))
    assert(r.ok, r.error)
    assert(spark.read.parquet(r.outputFile).columns.toSeq ==
      Seq("First_Name", "tax_rate", "column_2"))
  }

  test("sample-blind widening Q1: post-sample mismatch nulls the field") {
    val dir = tmpDir()
    val in = writeCsv(dir, "sample_blind.csv", "c\n1\n2\noops\n")
    val r = Converter.convertFile(spark, in, cfg(dir).copy(sampleRows = 2))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    assert(df.schema.head.dataType == LongType)
    val vals = df.collect().map(row => if (row.isNullAt(0)) None else Some(row.getLong(0))).toSet
    assert(vals == Set(Some(1L), Some(2L), None))
  }

  test("all-empty-sample column Q2: stays INT64, later strings null") {
    val dir = tmpDir()
    val in = writeCsv(dir, "all_empty.csv", "a,b\n1,\n2,\n3,hello\n")
    val r = Converter.convertFile(spark, in, cfg(dir).copy(sampleRows = 2))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    assert(df.schema("b").dataType == LongType)
    assert(df.where(df("b").isNotNull).count() == 0)
  }

  test("bool columns collapse to string (reference: INT64 init ⊔ BOOL = STRING)") {
    val dir = tmpDir()
    val in = writeCsv(dir, "bool_mix.csv", "flag,mixed\ntrue,true\nfalse,1\nyes,x\n")
    val r = Converter.convertFile(spark, in, cfg(dir).copy(sampleRows = 2))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    // both columns widen through bool to string; raw values survive verbatim
    assert(df.schema("flag").dataType == StringType)
    assert(df.schema("mixed").dataType == StringType)
    assert(df.count() == 3)
    assert(df.collect().map(_.getString(0)).toSet == Set("true", "false", "yes"))
  }

  test("null semantics: empty and whitespace cells → null; ragged rows dropped") {
    val dir = tmpDir()
    val in = writeCsv(dir, "nulls.csv",
      "a,b,c\n1,  ,x\n2,,y\n3,7,z\nshort,row\n4,8,w,EXTRA\n")
    val r = Converter.convertFile(spark, in, cfg(dir))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    // ragged rows (4 and 5) dropped like Go's FieldsPerRecord errors
    assert(df.count() == 3)
    assert(df.where(df("b").isNull).count() == 2)
  }

  test("Go-whitespace trim parity: tab-padded cells infer AND cast consistently") {
    val dir = tmpDir()
    // quoted fields preserve the tab; Spark's trim() would strip only
    // spaces, making inference (INT64) disagree with the cast (null)
    val in = writeCsv(dir, "tabs.csv",
      "a,b\n\"\t5\",\"\u00A07\"\n\"\t6\t\",\"8 \"\n")
    val r = Converter.convertFile(spark, in, cfg(dir))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    assert(df.schema("a").dataType == LongType, df.schema)
    assert(df.schema("b").dataType == LongType, df.schema) // U+00A0 is Go whitespace
    assert(df.collect().flatMap(r0 => Seq(r0.getLong(0), r0.getLong(1))).sorted.toSeq == Seq(5L, 6L, 7L, 8L))
  }

  test("numeric edge parity in data casts (FIXTURES §2.10)") {
    val dir = tmpDir()
    // sample sees ints/floats; later rows probe the Go parse edges
    val in = writeCsv(dir, "numeric.csv",
      "i,f\n1,1.5\n2,2.5\n9223372036854775808,1e400\n007,1_000.5\n+1,0x1p3\n1e5,inf\n")
    val r = Converter.convertFile(spark, in, cfg(dir).copy(sampleRows = 2))
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile).orderBy("i")
    val rows = df.collect()
    assert(df.schema("i").dataType == LongType && df.schema("f").dataType == DoubleType)
    val got = rows.map(r0 => (if (r0.isNullAt(0)) None else Some(r0.getLong(0)),
      if (r0.isNullAt(1)) None else Some(r0.getDouble(1)))).toSet
    assert(got == Set(
      (Some(1L), Some(1.5)),
      (Some(2L), Some(2.5)),
      (None, None),              // int64 overflow → null; 1e400 overflow → null
      (Some(7L), Some(1000.5)),  // 007 ok; 1_000.5 Go-valid
      (Some(1L), Some(8.0)),     // +1 ok; hex float
      (None, Some(Double.PositiveInfinity)))) // 1e5 not an int; inf is Go-valid
  }

  test("embedded newline in quoted field survives (Q6 / FIXTURES §2.9)") {
    val dir = tmpDir()
    val in = writeCsv(dir, "escapes.csv",
      "a,b\n\"line1\nline2\",\"he said \"\"hi\"\", ok\"\n")
    val r = Converter.convertFile(spark, in, cfg(dir))
    assert(r.ok, r.error)
    val row = spark.read.parquet(r.outputFile).collect().head
    assert(row.getString(0) == "line1\nline2")
    assert(row.getString(1) == "he said \"hi\", ok")
  }

  test("multiLine sniff: newline-free sample picks the splittable scan, quoted newline keeps parity mode") {
    val dir = tmpDir()
    // sniff facts from the inference prefix read
    val plain = writeCsv(dir, "plain.csv", "a,b\n1,x\n2,\"quoted, no newline\"\n")
    assert(!Inference.detectFileStats(spark, plain, ',', 100)._2)
    val quoted = writeCsv(dir, "quoted.csv", "a,b\n1,\"l1\nl2\"\n")
    assert(Inference.detectFileStats(spark, quoted, ',', 100)._2)
    // decision table
    val base = cfg(dir)
    assert(!Converter.effectiveMultiLine(base, sampleHadNewline = false))
    assert(Converter.effectiveMultiLine(base, sampleHadNewline = true))
    assert(Converter.effectiveMultiLine(base.copy(multiLineAuto = false), sampleHadNewline = false))
    assert(!Converter.effectiveMultiLine(base.copy(multiLine = false), sampleHadNewline = true))
    // end-to-end: the splittable path converts every row intact
    val r = Converter.convertFile(spark, plain, base)
    assert(r.ok, r.error)
    val rows = spark.read.parquet(r.outputFile).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet == Set("x", "quoted, no newline"))
  }

  test("--multiline forces parity mode; conflict with --no-multiline is rejected") {
    val loaded = GraftConfig.load(Seq("--input", "x.csv", "--multiline")).toOption.get
    assert(loaded.multiLine && !loaded.multiLineAuto)
    assert(GraftConfig.load(Seq("--input", "x.csv", "--multiline", "--no-multiline")).isLeft)
  }

  test("delimiters: tab and pipe; multi-char uses first char (converter.go:127-130)") {
    val dir = tmpDir()
    val tsv = writeCsv(dir, "d.tsv", "a\tb\n1\t2\n")
    val rt = Converter.convertFile(spark, tsv, cfg(dir).copy(delimiter = "\\t"))
    assert(rt.ok, rt.error)
    assert(spark.read.parquet(rt.outputFile).columns.toSeq == Seq("a", "b"))
    val psv = writeCsv(dir, "d.csv", "a|b\n1|2\n")
    val rp = Converter.convertFile(spark, psv, cfg(dir).copy(delimiter = "|;,"))
    assert(rp.ok, rp.error)
    assert(spark.read.parquet(rp.outputFile).columns.toSeq == Seq("a", "b"))
  }

  test("directory batch: glob *.csv, failures isolated, summary + exit code (FIXTURES §2.11)") {
    val dir = tmpDir()
    val batch = Files.createDirectory(dir.resolve("batch"))
    writeCsv(batch, "one.csv", "a\n1\n")
    writeCsv(batch, "two.csv", "b\n2\n")
    writeCsv(batch, "three.csv", "c\nx\n")
    writeCsv(batch, "skip.txt", "not,a,csv\n")
    writeCsv(batch, "bad.csv", "") // empty → header read fails → conversion fails
    val summary = Converter.convertAll(spark,
      GraftConfig(input = batch.toString, output = dir.resolve("out").toString, deleteOriginal = false))
    assert(summary.results.length == 4) // *.csv glob only
    assert(summary.converted == 3 && summary.failed == 1)
    assert(summary.exitCode == 1)
  }

  test("delete-original only after verified write; default keeps") {
    val dir = tmpDir()
    val in = writeCsv(dir, "del.csv", "a\n1\n")
    val r = Converter.convertFile(spark, in, cfg(dir).copy(deleteOriginal = true))
    assert(r.ok, r.error)
    assert(!Files.exists(JPath.of(in)))
    val in2 = writeCsv(dir, "keep.csv", "a\n1\n")
    val r2 = Converter.convertFile(spark, in2, cfg(dir))
    assert(r2.ok && Files.exists(JPath.of(in2)))
  }

  test("compression codec: each supported codec round-trips; zstd beats uncompressed") {
    val dir = tmpDir()
    val body = "a,b\n" + (1 to 500).map(i => s"$i,word$i word$i word$i").mkString("\n") + "\n"
    val sizes = Seq("uncompressed", "snappy", "zstd").map { codec =>
      val in = writeCsv(dir, s"c_$codec.csv", body)
      val r = Converter.convertFile(spark, in, cfg(dir).copy(codec = codec))
      assert(r.ok, r.error)
      assert(spark.read.parquet(r.outputFile).count() == 500)
      codec -> r.outputBytes
    }.toMap
    assert(sizes("zstd") < sizes("uncompressed"), sizes)
    // bad codec rejected at config level
    assert(GraftConfig.load(Seq("--input", "/x", "--codec", "brotli9000")).isLeft)
  }

  test("batch-size progress tick fires at debug level and counts every row (O18)") {
    val dir = tmpDir()
    val body = "a,b\n" + (1 to 25).map(i => s"$i,x$i").mkString("\n") + "\n"
    // debug + batchSize: the tick wrapper instruments the plan; its
    // accumulator sees every converted row (the assertable face of the
    // per-batchSize stderr line, which lands in executor logs)
    val in1 = writeCsv(dir, "tick.csv", body)
    val r1 = Converter.convertFile(spark, in1,
      cfg(dir).copy(logLevel = "debug", batchSize = 10))
    assert(r1.ok, r1.error)
    assert(Converter.lastTickRows.exists(_.value == 25L),
      s"tick accumulator saw ${Converter.lastTickRows.map(_.value)} rows, expected 25")
    assert(spark.read.parquet(r1.outputFile).count() == 25) // rows pass through untouched
    // info level: no instrumentation — the codegen'd plan is not broken
    // up for observability nobody asked for
    Converter.lastTickRows = None
    val in2 = writeCsv(dir, "notick.csv", body)
    val r2 = Converter.convertFile(spark, in2, cfg(dir).copy(batchSize = 10))
    assert(r2.ok, r2.error)
    assert(Converter.lastTickRows.isEmpty, "tick wrapper ran at info level")
  }

  test("config layering: defaults ← YAML ← flags with Q7 override rules") {
    val dir = tmpDir()
    val yaml = dir.resolve("c.yaml")
    Files.write(yaml, "input: /data\nsample_rows: 50\ndelete_original: true\ndelimiter: \";\"\n".getBytes)
    val Right(c1) = GraftConfig.load(Seq("--config", yaml.toString)): @unchecked
    assert(c1.input == "/data" && c1.sampleRows == 50 && c1.deleteOriginal && c1.delimiter == ";")
    // flags override; zero values cannot (quirk Q7)
    val Right(c2) = GraftConfig.load(Seq("--config", yaml.toString,
      "--input", "/other", "--sample-rows", "0", "--keep")): @unchecked
    assert(c2.input == "/other" && c2.sampleRows == 50 && !c2.deleteOriginal)
    // missing explicit config is fatal; missing input is fatal
    assert(GraftConfig.load(Seq("--config", "/nope.yaml")).isLeft)
    assert(GraftConfig.load(Seq("--output", "/o")).isLeft)
  }
}
