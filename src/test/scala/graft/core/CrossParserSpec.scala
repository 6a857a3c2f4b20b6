package graft.core

import java.io.StringReader
import java.nio.file.Files

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Consistency between the two CSV parsers in the pipeline: LazyCsv
  * (driver-side header + sampling pass) and Spark's univocity reader
  * (full data pass). If they disagree on a cell, inference classifies a
  * value the cast stage never sees — so for RFC-compliant inputs the two
  * must produce identical string matrices.
  *
  * Known, documented divergence (not asserted equal): Go-style lazy
  * quotes. univocity's STOP_AT_CLOSING_QUOTE and Go's LazyQuotes resolve
  * pathological bare-quote inputs differently; such inputs are outside
  * the RFC and the reference itself only "tolerates" them.
  */
class CrossParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lazyParse(text: String): Seq[Seq[String]] =
    new LazyCsv(new StringReader(text), ',').map(_.toSeq).toSeq

  private def sparkParse(text: String, nCols: Int): Seq[Seq[String]] = {
    val f = Files.createTempFile("xp", ".csv")
    Files.write(f, text.getBytes)
    val schema = StructType((0 until nCols).map(i => StructField(s"c$i", StringType)))
    val rows = spark.read
      .option("header", "false")
      .option("delimiter", ",")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "")
      .schema(schema)
      .csv(f.toString)
      .collect()
      .toSeq
    rows.map(r => (0 until nCols).map(i => if (r.isNullAt(i)) "" else r.getString(i)))
  }

  private val rfcInputs = Seq(
    ("plain", "a,b,c\n1,2,3\n", 3),
    ("quoted comma", "\"a,b\",c\n\"x\",y\n", 2),
    ("doubled quotes", "\"he said \"\"hi\"\"\",z\n\"\",w\n", 2),
    ("embedded newline", "\"l1\nl2\",q\nr,s\n", 2),
    ("crlf", "a,b\r\n1,2\r\n", 2),
    ("empty cells", "a,,c\n,,\n", 3),
    ("trailing empty", "a,b,\n1,2,\n", 3))

  for ((name, text, n) <- rfcInputs) {
    test(s"LazyCsv and Spark CSV agree on RFC input: $name") {
      val lz = lazyParse(text)
      val sp = sparkParse(text, n)
      // Spark's reader has no row order guarantee across partitions, but
      // these single-split files preserve order; compare as multisets to
      // be safe
      assert(lz.map(_.mkString("")).sorted == sp.map(_.mkString("")).sorted,
        s"lazy=$lz spark=$sp")
    }
  }
}
