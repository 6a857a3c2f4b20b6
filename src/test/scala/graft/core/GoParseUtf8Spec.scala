package graft.core

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The UTF8String fast paths must be observationally identical to the
  * String-grammar implementations they accelerate — pinned here over
  * curated edge cases plus seeded adversarial fuzz. */
class GoParseUtf8Spec extends AnyFunSuite {

  private def u8(s: String) = UTF8String.fromString(s)

  private val edges = Seq(
    "", " ", "  ", "\t a \n", " x ", "y", "  z  ",
    "a b", "0", "-0", "+0", "007", "+", "-", "++1", "1-", "12345678901234567890",
    "9223372036854775807", "9223372036854775808", "-9223372036854775808",
    "-9223372036854775809", "1_000", "0x10", "1.5", "-1.5e10", ".5", "5.",
    "1e", "1e+", "1e5", "1E-5", "5e-324", "1e400", "-1e400", "1__0", "_1", "1_",
    "1d", "1f", "inf", "Inf", "+inf", "-Infinity", "nan", "NaN", "0x1p3",
    "0x1.8p1", "1_000.5", "true", "TRUE", "True", "false", "FALSE", "t", "yes",
    "trze", "trué", "truE", "falsÉ", "١٢٣", " 1.5", "1.5 ", "a",
    " ", " 1 ", "0.1.2", "-.", "+.e5", ".e5", "-.5", "+.5e-3",
    // exact-power-of-ten fast-path boundaries
    "9007199254740992", "9007199254740993", "-9007199254740993", "0.1",
    "1e22", "1e-22", "1e23", "1e-23", "2.5e15", "123456789012345678",
    "1234567890123456789", "12345678901234567890.5", "0.000000000000000001",
    "000000000000000000001.5", "9007199254740991.5", "1e308", "1e-308",
    "4.9e-324", "2.2250738585072011e-308", "0e22", "-0e-22", "1e2147483700")

  private val rng = new scala.util.Random(20260812L)
  private val alphabet =
    "0123456789+-._eExXpPaAfF \t\n  truefalseTRUEFALSEé"
  private val fuzz = Seq.fill(4000) {
    val n = rng.nextInt(12)
    Seq.fill(n)(alphabet(rng.nextInt(alphabet.length))).mkString
  }

  test("trimSpaceUtf8 == trimSpace on every input") {
    (edges ++ fuzz).foreach { s =>
      assert(GoParse.trimSpaceUtf8(u8(s)).toString == GoParse.trimSpace(s), s"input <$s>")
    }
    assert(GoParse.trimSpaceUtf8(null) == null)
    // the no-trim fast path must return the SAME object (zero alloc)
    val v = u8("abc")
    assert(GoParse.trimSpaceUtf8(v) eq v)
  }

  test("parseLongBoxedUtf8 == parseLongBoxed on every input") {
    (edges ++ fuzz).foreach { s =>
      assert(GoParse.parseLongBoxedUtf8(u8(s)) == GoParse.parseLongBoxed(s), s"input <$s>")
    }
    assert(GoParse.parseLongBoxedUtf8(null) == null)
  }

  test("parseDoubleBoxedUtf8 == parseDoubleBoxed on every input") {
    (edges ++ fuzz).foreach { s =>
      val fast = GoParse.parseDoubleBoxedUtf8(u8(s))
      val ref = GoParse.parseDoubleBoxed(s)
      // NaN != NaN; compare raw bits so -0.0 vs 0.0 also stays pinned
      val same = (fast == null && ref == null) || (fast != null && ref != null &&
        java.lang.Double.doubleToRawLongBits(fast) == java.lang.Double.doubleToRawLongBits(ref))
      assert(same, s"input <$s>: fast=$fast ref=$ref")
    }
    assert(GoParse.parseDoubleBoxedUtf8(null) == null)
  }

  test("parseBoolBoxedUtf8 == parseBoolBoxed on every input") {
    (edges ++ fuzz).foreach { s =>
      assert(GoParse.parseBoolBoxedUtf8(u8(s)) == GoParse.parseBoolBoxed(s), s"input <$s>")
    }
    assert(GoParse.parseBoolBoxedUtf8(null) == null)
  }
}
