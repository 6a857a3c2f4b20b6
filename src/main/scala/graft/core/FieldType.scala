package graft.core

import org.apache.spark.sql.types._

/** The reference's effective type lattice (converter/converter.go:29-64).
  *
  * The Go enum also declares `typeDate`/`typeTimestamp`, but they are dead
  * variants: `inferType` deliberately collapses every date/timestamp match
  * to string ("store dates as strings for compatibility",
  * converter/converter.go:264-275) and nothing else produces them. The
  * live lattice is {INT64, DOUBLE, BOOLEAN, UTF8} with string as top.
  */
sealed trait FieldType {
  def sparkType: DataType = this match {
    case FieldType.TInt64   => LongType
    case FieldType.TFloat64 => DoubleType
    case FieldType.TBool    => BooleanType
    case FieldType.TString  => StringType
  }
}

object FieldType {
  case object TInt64 extends FieldType
  case object TFloat64 extends FieldType
  case object TBool extends FieldType
  case object TString extends FieldType

  /** Classify one raw cell, mirroring `inferType`
    * (converter/converter.go:241-279). Order matters: bool → int → float →
    * everything else (incl. dates) → string. The input is trimmed first,
    * exactly as the reference does — note the sampling loop skips only
    * *exactly-empty* cells before calling this, so a whitespace-only cell
    * reaches inferType, trims to "", and widens the column to string.
    */
  def infer(raw: String): FieldType = {
    val v = if (raw == null) "" else GoParse.trimSpace(raw)
    if (v.isEmpty) TString
    else if (GoParse.parseBool(v).isDefined) TBool
    else if (GoParse.parseLong(v).isDefined) TInt64
    else if (GoParse.parseDouble(v).isDefined) TFloat64
    else TString // date layouts also land here (converter.go:274)
  }

  /** Widening join, mirroring `widenType` (converter/converter.go:282-303).
    * string is absorbing top; float⊔int=float; bool mixes with any numeric
    * to string.
    *
    * Consequence worth noting (verified against the Go code and pinned in
    * ConverterSpec): a BOOLEAN column can never survive inference. Columns
    * start optimistically at INT64 (converter.go:216) and
    * widen(INT64, BOOL) = STRING, so the first `true`/`false` cell flips
    * the column to string. `typeBool` — like `typeDate`/`typeTimestamp` —
    * is effectively dead in reference output schemas, and its JSON-emit
    * branch (quirk Q4, converter.go:401-403) is unreachable.
    */
  def widen(current: FieldType, next: FieldType): FieldType = {
    if (current == TString || next == TString) TString
    else if (current == TFloat64 || next == TFloat64) {
      if (current == TBool || next == TBool) TString else TFloat64
    } else if (current == TBool && next == TBool) TBool
    else if ((current == TBool) != (next == TBool)) TString
    else if (current == TInt64 && next == TInt64) TInt64
    else TString
  }
}
