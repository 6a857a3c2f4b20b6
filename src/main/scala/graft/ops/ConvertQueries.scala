package graft.ops

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Converter, FieldType, Inference}

/** The converter path (reference O1-O18 surface) exposed as a driver-oracle
  * query: convert a committed quirks fixture CSV end-to-end through the
  * real inference + cast pipeline and return the typed rows.
  *
  * The fixture (src/main/resources/graft/quirks_fixture.csv) packs the
  * reference's inference edge cases into 10 data rows + 1 ragged row
  * (reference semantics: converter/converter.go:185-239 inference,
  * :241-279 inferType, :380-412 casts):
  *
  *  - BOM + '.'/' ' headers        -> normalized names (id, price_usd, ...)
  *  - hex float 0x1.8p1, 1_000.5,
  *    -2.25e2, .5                  -> Go float grammar, column DOUBLE
  *  - 9223372036854775808          -> int64 overflow => classified float
  *  - qty "oops" BEYOND the sample -> Q1 sample-blind: stays INT64, cell
  *                                    parses to null in the cast pass
  *  - empty_col all empty          -> Q2: inference never downgrades, the
  *                                    optimistic INT64 survives (all null)
  *  - true/false column            -> §8 correction: BOOL is unreachable
  *                                    (widen(INT64, BOOL) = STRING)
  *  - whitespace-only cell in
  *    sample                       -> trims to "" => column STRING; the
  *                                    cast pass nulls it (GoTrim + empty)
  *  - quoted comma / doubled quote
  *    / embedded newline           -> Go encoding/csv parsing semantics
  *  - ragged row (3 of 8 fields)   -> dropped whole (§8: FieldsPerRecord)
  *
  * The oracle is the literal expected relation (VALUES), NOT DuckDB's own
  * CSV reader — no other engine reproduces Go's strconv grammar (hex
  * floats, underscores, overflow-to-error), which is exactly why this
  * path needs the hard driver-side check.
  */
object ConvertQueries {

  /** sampleRows for the fixture: the inference window covers records 1-6
    * (ids 1-5 + the ragged row), so ids 7-10 exercise sample-blind cells. */
  val FixtureSampleRows = 6

  /** A committed fixture, materialized from the classpath to a stable
    * temp file once per JVM (Hadoop-path APIs and spark.read need a
    * filesystem path, not a classpath resource). */
  private[graft] def materialize(resource: String, suffix: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val tmp: Path = Files.createTempFile("graft-quirks-", suffix)
    try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING) finally in.close()
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  lazy val fixturePath: String = materialize("/graft/quirks_fixture.csv", ".csv")
  lazy val jsonFixturePath: String = materialize("/graft/quirks_fixture.jsonl", ".jsonl")

  /** q61: the full infer -> scan -> cast conversion plan over the fixture,
    * ordered by the key column. `dir` is unused — the input is the
    * committed fixture, not a testdata table. */
  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = Inference.detectFile(spark, fixturePath, ',', FixtureSampleRows)
    Converter.conversionPlan(spark, fixturePath, schema, ',', multiLine = true)
      .orderBy("id")
  }

  /** q68: the JSON-lines source extension end-to-end — every scalar reads
    * as its string rendering (`primitivesAsString`), nested values
    * collapse to their JSON text, then the SAME lattice + GoCast pipeline
    * as CSV. The fixture pins: JSON bools -> string column (bool is
    * unreachable in the lattice), a Go hex float inside a JSON string,
    * empty/whitespace strings -> null, a row with missing fields -> all
    * nulls, arrays/objects -> their JSON text. Literal-relation oracle,
    * as for q61. */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Converter.jsonConversionPlan(spark, jsonFixturePath, sampleRows = 100)
      .orderBy("id")

  /** q87: schema-drift report over a directory batch — when a directory
    * of CSVs converts (O12's unit of parallelism), each file infers its
    * own schema (converter/converter.go:116-127); this report surfaces
    * per-file deviations from the directory consensus BEFORE they become
    * incompatible parquet outputs. Consensus per column = most frequent
    * inferred type, ties widened through the reference lattice.
    * Per-file inference runs as ONE distributed job
    * ([[Inference.detectFiles]]) — reference sampling semantics per file,
    * executor-parallel across files; only the O(files × columns)
    * consensus fold is driver-side metadata work. */
  def schemaReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def typeName(t: FieldType): String = t match {
      case FieldType.TInt64 => "INT64"
      case FieldType.TFloat64 => "DOUBLE"
      case FieldType.TBool => "BOOL"
      case FieldType.TString => "STRING"
    }
    val byPath = Inference.detectFiles(
      spark, driftFixturePaths.map(_._2), ',', sampleRows = 100)
    val perFile = driftFixturePaths.map { case (name, path) => name -> byPath(path) }
    val all = perFile.flatMap { case (f, s) => s.headers.zip(s.types).map { case (h, t) => (f, h, t) } }
    val consensus: Map[String, FieldType] = all.groupBy(_._2).map { case (h, ts) =>
      val byFreq = ts.groupBy(_._3).map { case (t, xs) => (t, xs.size) }
      val top = byFreq.values.max
      h -> byFreq.collect { case (t, n) if n == top => t }.reduce(FieldType.widen)
    }
    all.map { case (f, h, t) =>
      (f, h, typeName(t), typeName(consensus(h)), if (t != consensus(h)) 1L else 0L)
    }.toDF("file", "column_name", "inferred_type", "consensus_type", "drift")
      .orderBy("file", "column_name")
  }

  private lazy val driftFixturePaths: Seq[(String, String)] =
    Seq("drift_a.csv", "drift_b.csv", "drift_c.csv")
      .map(n => n -> materialize(s"/graft/$n", ".csv"))

  /** q83: silent-null cast telemetry — per column, how many values the
    * reference's parse-to-null semantics coerced away (null out minus
    * empty/whitespace in). The reference nulls silently
    * (converter/converter.go:380-412); an engine that REPORTS the
    * coercion rate turns that data-loss mode into an observable. Two
    * single-row aggregates (raw emptiness, post-cast nullness) over the
    * same scan options, stacked to one row per column. */
  def castNullStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val schema = Inference.detectFile(spark, fixturePath, ',', FixtureSampleRows)
    val cast = Converter.conversionPlan(spark, fixturePath, schema, ',', multiLine = true)
    val raw = Converter.rawStringPlan(spark, fixturePath, schema, ',', multiLine = true)
    val cols = schema.headers
    // emptiness must use GoTrim (Go's full whitespace set), the same trim
    // the cast path applies — Spark's trim strips only ASCII 0x20, so a
    // "\t"-only cell would be misclassified as a type coercion
    val rawAgg = raw.agg(count(lit(1)).as("n_rows"),
      cols.map(c => sum(when(col(c).isNull ||
        graft.functions.GoCast.goTrim(col(c)) === "", 1L).otherwise(0L)).as(s"e_$c")): _*)
    val castAgg = cast.agg(
      sum(lit(0L)).as("ignore"),
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_$c")): _*)
    rawAgg.crossJoin(castAgg)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"), col("n_rows"),
        col(s"e_$c").as("n_empty_in"), col(s"n_$c").as("n_null_out"),
        (col(s"n_$c") - col(s"e_$c")).as("n_coerced"))): _*)).as("x"))
      .select("x.column_name", "x.n_rows", "x.n_empty_in", "x.n_null_out", "x.n_coerced")
      .orderBy("column_name")
  }
}
