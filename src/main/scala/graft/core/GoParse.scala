package graft.core

/** Scalar parse predicates mirroring the reference converter's use of Go's
  * `strconv` (reference: converter/converter.go:241-279, :380-412).
  *
  * The reference classifies and casts cell values with
  * `strconv.ParseInt(v, 10, 64)` / `strconv.ParseFloat(v, 64)` / a
  * case-insensitive bool compare. Java's parsers differ from Go's in edge
  * cases (Java accepts `"1d"`, `" 1 "`, Unicode digits; Go accepts `"inf"`,
  * `"1_000.5"`, hex floats, and errors on overflow), so each parse is
  * regex-validated against the Go literal grammar before delegating to the
  * JVM parser.
  *
  * Documented deviation: Go's ParseFloat reports ErrRange (→ not-a-float for
  * the reference) on underflow below the smallest subnormal; we treat such
  * values as 0.0 like the JVM does. Overflow (→ ±Inf) is mirrored exactly:
  * it is a parse failure here, as in Go.
  */
object GoParse {
  // Go base-10 integer: optional sign + ASCII digits, no underscores
  // (strconv.ParseInt permits underscores only when base == 0).
  private val IntRe = java.util.regex.Pattern.compile("[+-]?[0-9]+")

  // Go float literal grammar (https://go.dev/ref/spec#Floating-point_literals)
  // with digit-separating underscores; special values per strconv/atof.go
  // `special()`: optional sign + inf|infinity|nan, case-insensitive.
  private val SpecialRe =
    java.util.regex.Pattern.compile("(?i)[+-]?(inf(inity)?|nan)")
  private val dec = "[0-9](?:_?[0-9])*"
  private val hex = "[0-9a-fA-F](?:_?[0-9a-fA-F])*"
  private val DecFloatRe = java.util.regex.Pattern.compile(
    s"[+-]?(?:$dec(?:\\.(?:$dec)?)?|\\.$dec)(?:[eE][+-]?$dec)?")
  private val HexFloatRe = java.util.regex.Pattern.compile(
    s"[+-]?0[xX](?:$hex(?:\\.(?:$hex)?)?|\\.$hex)[pP][+-]?$dec")

  /** Mirror of `strconv.ParseInt(s, 10, 64)`: None on syntax error or
    * int64 overflow. */
  def parseLong(s: String): Option[Long] =
    if (s == null || !IntRe.matcher(s).matches()) None
    else
      try Some(java.lang.Long.parseLong(s))
      catch { case _: NumberFormatException => None } // overflow

  /** Mirror of `strconv.ParseFloat(s, 64)` as the reference uses it (an
    * error — including overflow/ErrRange — means "not a float"). */
  def parseDouble(s: String): Option[Double] = {
    if (s == null || s.isEmpty) return None
    if (SpecialRe.matcher(s).matches()) {
      val neg = s.charAt(0) == '-'
      val body = (if (s.charAt(0) == '+' || neg) s.substring(1) else s).toLowerCase
      Some(
        if (body == "nan") Double.NaN
        else if (neg) Double.NegativeInfinity
        else Double.PositiveInfinity)
    } else if (DecFloatRe.matcher(s).matches() || HexFloatRe.matcher(s).matches()) {
      try {
        val d = java.lang.Double.parseDouble(s.replace("_", ""))
        // Go returns ErrRange when the value overflows float64; the
        // reference then treats the cell as non-float.
        if (java.lang.Double.isInfinite(d)) None else Some(d)
      } catch { case _: NumberFormatException => None }
    } else None
  }

  /** Reference bool test: lowercased equality with true/false
    * (converter/converter.go:248-251). */
  def parseBool(s: String): Option[Boolean] = {
    if (s == null) return None
    val lower = s.toLowerCase
    if (lower == "true") Some(true)
    else if (lower == "false") Some(false)
    else None
  }

  /** Mirror of Go's `unicode.IsSpace` (strings.TrimSpace's predicate):
    * Latin-1 fast path {'\t','\n','\v','\f','\r',' ',U+0085,U+00A0} plus
    * the Unicode White_Space property above — NOT Java's
    * `Character.isWhitespace` (which excludes U+00A0/U+0085 and includes
    * the 0x1C-0x1F separators) and NOT `String.trim` (which cuts every
    * char <= 0x20). */
  def isGoSpace(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' | ' ' | '\u0085' | '\u00A0' => true
    case _ if c > 0xFF => Character.isSpaceChar(c) || Character.isWhitespace(c)
    case _ => false
  }

  /** Mirror of Go's `strings.TrimSpace`. */
  def trimSpace(s: String): String = {
    if (s == null) return null
    var start = 0
    var end = s.length
    while (start < end && isGoSpace(s.charAt(start))) start += 1
    while (end > start && isGoSpace(s.charAt(end - 1))) end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  // ---- boxed variants for Catalyst codegen (see functions.GoCast) ----
  def trimSpaceUtf8(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (s == null) null
    else org.apache.spark.unsafe.types.UTF8String.fromString(trimSpace(s.toString))

  def parseDoubleBoxed(s: String): java.lang.Double =
    parseDouble(s) match { case Some(d) => java.lang.Double.valueOf(d); case None => null }
  def parseLongBoxed(s: String): java.lang.Long =
    parseLong(s) match { case Some(l) => java.lang.Long.valueOf(l); case None => null }
  def parseBoolBoxed(s: String): java.lang.Boolean =
    parseBool(s) match { case Some(b) => java.lang.Boolean.valueOf(b); case None => null }
}
