package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven parse-parity tests. Each expectation mirrors Go's
  * strconv behavior as the reference uses it (converter/converter.go:241-279)
  * — see FIXTURES.md §2.10 for the fixture rationale.
  */
class GoParseSpec extends AnyFunSuite {

  test("parseLong mirrors strconv.ParseInt(s, 10, 64)") {
    assert(GoParse.parseLong("+1").contains(1L))
    assert(GoParse.parseLong("-42").contains(-42L))
    assert(GoParse.parseLong("007").contains(7L))
    assert(GoParse.parseLong("9223372036854775807").contains(Long.MaxValue))
    assert(GoParse.parseLong("-9223372036854775808").contains(Long.MinValue))
    // overflow errors in Go (→ not an int)
    assert(GoParse.parseLong("9223372036854775808").isEmpty)
    // base-10 ParseInt rejects underscores, floats, hex, whitespace, empty
    assert(GoParse.parseLong("1_000").isEmpty)
    assert(GoParse.parseLong("1.5").isEmpty)
    assert(GoParse.parseLong("1e5").isEmpty)
    assert(GoParse.parseLong("0x10").isEmpty)
    assert(GoParse.parseLong(" 1").isEmpty)
    assert(GoParse.parseLong("1 ").isEmpty)
    assert(GoParse.parseLong("").isEmpty)
    assert(GoParse.parseLong("+").isEmpty)
    // Java's Long.parseLong would accept Unicode digits; Go does not
    assert(GoParse.parseLong("١٢٣").isEmpty)
  }

  test("parseDouble mirrors strconv.ParseFloat(s, 64)") {
    assert(GoParse.parseDouble("1e5").contains(100000.0))
    assert(GoParse.parseDouble("-0.0").exists(d => d == 0.0 && 1.0 / d < 0))
    assert(GoParse.parseDouble(".5").contains(0.5))
    assert(GoParse.parseDouble("5.").contains(5.0))
    assert(GoParse.parseDouble("1_000.5").contains(1000.5)) // Go permits digit separators
    assert(GoParse.parseDouble("0x1p3").contains(8.0))      // Go hex float
    assert(GoParse.parseDouble("0x1.8p1").contains(3.0))
    // Go special values are case-insensitive with optional sign
    assert(GoParse.parseDouble("Inf").contains(Double.PositiveInfinity))
    assert(GoParse.parseDouble("inf").contains(Double.PositiveInfinity))
    assert(GoParse.parseDouble("-Infinity").contains(Double.NegativeInfinity))
    assert(GoParse.parseDouble("+inf").contains(Double.PositiveInfinity))
    assert(GoParse.parseDouble("nan").exists(_.isNaN))
    assert(GoParse.parseDouble("NaN").exists(_.isNaN))
    // failures: Go syntax only
    assert(GoParse.parseDouble("0x10").isEmpty)  // hex needs a p exponent
    assert(GoParse.parseDouble("1__0").isEmpty)  // doubled separator
    assert(GoParse.parseDouble("_1").isEmpty)
    assert(GoParse.parseDouble("1_").isEmpty)
    assert(GoParse.parseDouble("1d").isEmpty)    // Java-only suffix
    assert(GoParse.parseDouble("1f").isEmpty)
    assert(GoParse.parseDouble(" 1.5").isEmpty)  // Java trims; Go errors
    assert(GoParse.parseDouble("1e").isEmpty)
    assert(GoParse.parseDouble(".").isEmpty)
    assert(GoParse.parseDouble("").isEmpty)
    // overflow → ErrRange in Go → reference treats as non-float
    assert(GoParse.parseDouble("1e400").isEmpty)
    assert(GoParse.parseDouble("-1e400").isEmpty)
  }

  test("trimSpace mirrors Go strings.TrimSpace, not Java trim") {
    assert(GoParse.trimSpace("\t a \n") == "a")
    assert(GoParse.trimSpace(" x ") == "x") // NBSP: Java trim keeps it
    assert(GoParse.trimSpace("y") == "y")       // NEL: Java isWhitespace says no
    assert(GoParse.trimSpace(" z ") == "z") // EM SPACE (Zs)
    assert(GoParse.trimSpace("v") == "v")
    assert(GoParse.trimSpace("") == "")
    assert(GoParse.trimSpace("   ") == "")
    assert(GoParse.trimSpace("a b") == "a b")         // interior space kept
    // U+001F is NOT Go whitespace (Java's isWhitespace disagrees)
    assert(GoParse.trimSpace("q") == "q")
  }

  test("parseBool is lowercased true/false only") {
    assert(GoParse.parseBool("true").contains(true))
    assert(GoParse.parseBool("TRUE").contains(true))
    assert(GoParse.parseBool("False").contains(false))
    assert(GoParse.parseBool("1").isEmpty)
    assert(GoParse.parseBool("yes").isEmpty)
    assert(GoParse.parseBool("t").isEmpty)
    assert(GoParse.parseBool("").isEmpty)
  }
}
