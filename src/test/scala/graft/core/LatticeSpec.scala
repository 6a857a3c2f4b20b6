package graft.core

import org.scalatest.funsuite.AnyFunSuite

import FieldType._

/** Lattice-law tests for the widening join
  * (converter/converter.go:282-303) plus the inferType classification
  * table (converter/converter.go:241-279). The lattice has exactly four
  * elements, so the laws are checked exhaustively.
  */
class LatticeSpec extends AnyFunSuite {
  private val all: Seq[FieldType] = Seq(TInt64, TFloat64, TBool, TString)

  test("widen is commutative") {
    for (a <- all; b <- all) assert(widen(a, b) == widen(b, a), s"$a,$b")
  }

  test("widen is idempotent") {
    for (a <- all) assert(widen(a, a) == a)
  }

  test("widen is associative") {
    for (a <- all; b <- all; c <- all)
      assert(widen(widen(a, b), c) == widen(a, widen(b, c)), s"$a,$b,$c")
  }

  test("string is the absorbing top") {
    for (a <- all) {
      assert(widen(TString, a) == TString)
      assert(widen(a, TString) == TString)
    }
  }

  test("reference lattice table") {
    assert(widen(TInt64, TFloat64) == TFloat64) // int ⊔ float = float
    assert(widen(TInt64, TInt64) == TInt64)
    assert(widen(TBool, TBool) == TBool)
    assert(widen(TBool, TInt64) == TString)     // bool ⊔ num = string
    assert(widen(TBool, TFloat64) == TString)
    assert(widen(TFloat64, TFloat64) == TFloat64)
  }

  test("infer classification (incl. date collapse and whitespace quirk)") {
    assert(infer("true") == TBool)
    assert(infer("FALSE") == TBool)
    assert(infer("123") == TInt64)
    assert(infer("+7") == TInt64)
    assert(infer("3.5") == TFloat64)
    assert(infer("1e5") == TFloat64)
    assert(infer("1_000") == TFloat64)           // int parse fails on _, float accepts
    assert(infer("9223372036854775808") == TFloat64) // int64 overflow → float probe succeeds
    assert(infer("2021-01-02") == TString)       // dates stay strings (converter.go:274)
    assert(infer("2021-01-02T10:00:00") == TString)
    assert(infer("01/02/2021") == TString)
    assert(infer("abc") == TString)
    assert(infer("  ") == TString)               // whitespace-only trims to "" → string
    assert(infer(" 5 ") == TInt64)               // inferType trims before probing
  }
}
