package graft.core

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSON-lines ingestion (extension beyond the CSV-only reference) with
  * the same inference lattice and cast semantics. */
class JsonConverterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(dir: JPath, name: String, content: String): String = {
    val p = dir.resolve(name); Files.write(p, content.getBytes); p.toString
  }

  test("JSON lines: lattice applies to string renderings; nested collapses to JSON text") {
    val dir = Files.createTempDirectory("graft-json")
    val in = write(dir, "data.json",
      """{"id": 1, "score": 3.5, "name": "alice", "meta": {"k": 1}}
        |{"id": 2, "score": 4, "name": "bob", "tags": ["x", "y"]}
        |{"id": "oops", "score": "1e400", "name": ""}
        |""".stripMargin)
    val cfg = GraftConfig(output = dir.resolve("out").toString, sampleRows = 2)
    val r = Converter.convertJsonFile(spark, in, cfg)
    assert(r.ok, r.error)
    val df = spark.read.parquet(r.outputFile)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.schema("name").dataType == StringType)
    assert(df.schema("meta").dataType == StringType) // nested → JSON text
    assert(df.schema("tags").dataType == StringType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    // post-sample non-conforming values null silently, like the CSV path
    assert(rows.exists(r0 => r0.isNullAt(r0.fieldIndex("id")) &&
      r0.isNullAt(r0.fieldIndex("score"))))
    // primitivesAsString applies inside nested structs too: {"k":"1"}
    assert(rows.exists(r0 => !r0.isNullAt(r0.fieldIndex("meta")) &&
      r0.getString(r0.fieldIndex("meta")).contains("\"k\":\"1\"")))
  }

  test("samplingRatio bounds structural inference without changing uniform-shape output") {
    val dir = Files.createTempDirectory("graft-jsonsr")
    val body = (1 to 400).map(i => s"""{"id": $i, "score": $i.5}""").mkString("\n") + "\n"
    val in = write(dir, "big.json", body)
    val full = Converter.convertJsonFile(spark, in,
      GraftConfig(output = dir.resolve("o1").toString))
    // uniform per-line structure: a 10% deterministic structural sample
    // must land on the identical schema and full row set (the data pass
    // always reads everything — only inference is sampled)
    val sampled = Converter.convertJsonFile(spark, in,
      GraftConfig(output = dir.resolve("o2").toString, jsonSamplingRatio = 0.1))
    assert(full.ok && sampled.ok, (full.error, sampled.error))
    val a = spark.read.parquet(full.outputFile)
    val b = spark.read.parquet(sampled.outputFile)
    assert(a.schema == b.schema)
    assert(b.count() == 400)
    // flag validation: out-of-range ratios rejected at config level
    assert(GraftConfig.load(Seq("--input", "/x", "--json-sampling-ratio", "0")).isLeft)
    assert(GraftConfig.load(Seq("--input", "/x", "--json-sampling-ratio", "1.5")).isLeft)
    val Right(c) = GraftConfig.load(
      Seq("--input", "/x", "--json-sampling-ratio", "0.25")): @unchecked
    assert(c.jsonSamplingRatio == 0.25)
  }

  test("directory batch with --format json globs *.json only") {
    val dir = Files.createTempDirectory("graft-jsonb")
    val batch = Files.createDirectory(dir.resolve("batch"))
    write(batch, "a.json", "{\"x\": 1}\n")
    write(batch, "b.json", "{\"x\": 2}\n")
    write(batch, "skip.csv", "x\n3\n")
    val summary = Converter.convertAll(spark,
      GraftConfig(input = batch.toString, output = dir.resolve("out").toString, format = "json"))
    assert(summary.results.length == 2 && summary.converted == 2)
  }
}
