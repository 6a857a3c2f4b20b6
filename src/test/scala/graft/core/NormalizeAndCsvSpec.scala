package graft.core

import java.io.StringReader

import org.scalatest.funsuite.AnyFunSuite

class NormalizeAndCsvSpec extends AnyFunSuite {

  test("header normalization (converter/converter.go:201-211)") {
    assert(Normalize.header("\uFEFFFirst Name", 0) == "First_Name")
    assert(Normalize.header(" tax.rate ", 1) == "tax_rate")
    assert(Normalize.header("", 2) == "column_2")
    assert(Normalize.header("   ", 3) == "column_3")
    assert(Normalize.header("a.b c", 4) == "a_b_c")
    assert(Normalize.headers(Seq("\uFEFFx", "", "y z")) == Seq("x", "column_1", "y_z"))
  }

  private def parse(text: String, delim: Char = ','): List[List[String]] =
    new LazyCsv(new StringReader(text), delim).map(_.toList).toList

  test("LazyCsv basic split and line endings") {
    assert(parse("a,b,c\n1,2,3\n") == List(List("a", "b", "c"), List("1", "2", "3")))
    assert(parse("a,b\r\n1,2\r\n") == List(List("a", "b"), List("1", "2")))
    assert(parse("a,b") == List(List("a", "b")))
    assert(parse("a,,b\n") == List(List("a", "", "b")))
    assert(parse("a,b,\n") == List(List("a", "b", "")))
  }

  test("LazyCsv quoted fields: comma, newline, doubled quote") {
    assert(parse("\"a,b\",c\n") == List(List("a,b", "c")))
    assert(parse("\"line1\nline2\",x\n") == List(List("line1\nline2", "x")))
    assert(parse("\"he said \"\"hi\"\"\",y\n") == List(List("he said \"hi\"", "y")))
    // CRLF inside quoted field normalizes to \n (Go csv behavior)
    assert(parse("\"a\r\nb\",c\n") == List(List("a\nb", "c")))
  }

  test("LazyCsv lazy quotes: bare quotes are literal") {
    // quote inside unquoted field
    assert(parse("a\"b,c\n") == List(List("a\"b", "c")))
    // non-doubled quote inside quoted field (LazyQuotes=true tolerates)
    assert(parse("\"a\"b\",c\n") == List(List("a\"b\"", "c")) ||
      parse("\"a\"b\",c\n") == List(List("a\"b", "c")))
    // unterminated quote at EOF: emit what we have
    assert(parse("\"abc") == List(List("abc")))
  }

  test("LazyCsv skips blank lines and custom delimiter") {
    assert(parse("a,b\n\n\n1,2\n") == List(List("a", "b"), List("1", "2")))
    assert(parse("a|b\n1|2\n", '|') == List(List("a", "b"), List("1", "2")))
    assert(parse("a\tb\n", '\t') == List(List("a", "b")))
  }

  test("Inference.detect: types_basic (FIXTURES §2.1)") {
    val rows = Iterator(Array("1", "3.5", "true", "alice", "2021-01-02"),
      Array("2", "4", "false", "bob", "2021-02-03"))
    val s = Inference.detect(Seq("id", "score", "active", "name", "joined"), rows, 100)
    assert(s.headers == Seq("id", "score", "active", "name", "joined"))
    // `active` is STRING: widen(INT64-init, BOOL) = STRING — bool columns
    // are unreachable in the reference (FieldType.widen scaladoc)
    assert(s.types == Seq(FieldType.TInt64, FieldType.TFloat64, FieldType.TString,
      FieldType.TString, FieldType.TString))
  }

  test("Inference.detect: sample-window blindness Q1 + all-empty Q2") {
    // column sampled as [1, 2] with sampleRows=2; "oops" arrives later
    val rows = Iterator(Array("1"), Array("2"), Array("oops"))
    assert(Inference.detect(Seq("c"), rows, 2).types == Seq(FieldType.TInt64))
    // all-empty sample keeps the optimistic INT64 (converter.go:216-217)
    val empty = Iterator(Array(""), Array(""))
    assert(Inference.detect(Seq("c"), empty, 100).types == Seq(FieldType.TInt64))
    // but a whitespace-only cell is NOT skipped (only "" is) → widens to string
    val ws = Iterator(Array(" "))
    assert(Inference.detect(Seq("c"), ws, 100).types == Seq(FieldType.TString))
  }

  test("Inference.detect: ragged sampled rows are skipped but count toward the window") {
    val rows = Iterator(Array("1", "2"), Array("onlyone"), Array("x", "y"))
    val s = Inference.detect(Seq("a", "b"), rows, 3)
    // row2 (ragged) skipped; rows 1+3 sampled → a widens int→string, b too
    assert(s.types == Seq(FieldType.TString, FieldType.TString))
  }
}
