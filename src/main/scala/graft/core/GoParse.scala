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
  def parseDoubleBoxed(s: String): java.lang.Double =
    parseDouble(s) match { case Some(d) => java.lang.Double.valueOf(d); case None => null }
  def parseLongBoxed(s: String): java.lang.Long =
    parseLong(s) match { case Some(l) => java.lang.Long.valueOf(l); case None => null }
  def parseBoolBoxed(s: String): java.lang.Boolean =
    parseBool(s) match { case Some(b) => java.lang.Boolean.valueOf(b); case None => null }

  // ---- zero-allocation UTF8String fast paths (see functions.GoCast) ----
  // The converter's cast projection runs these per CELL; the String-based
  // paths above cost a UTF8String->String copy plus a regex matcher per
  // call, which measured as the dominant cost of the whole CSV->parquet
  // pipeline (ConvertBench: ~13s of 15.6s at 32 cores on 1 GiB). Each
  // fast path handles the all-ASCII common case byte-wise with zero
  // allocation and delegates any non-ASCII / exotic input to the exact
  // String-grammar implementation above, so semantics are unchanged.

  private type U8 = org.apache.spark.unsafe.types.UTF8String

  /** Single-byte (ASCII) members of Go's whitespace set. The multi-byte
    * members (U+0085, U+00A0, Unicode White_Space) encode with a negative
    * lead byte in UTF-8, which routes to the String fallback below. */
  private def isAsciiGoSpace(b: Byte): Boolean =
    b == ' '.toByte || (b >= '\t'.toByte && b <= '\r'.toByte)

  /** Go `strings.TrimSpace` over UTF-8 bytes. Returns the input object
    * untouched (zero alloc) when the boundary bytes are ASCII non-space —
    * the overwhelmingly common case for CSV cells. */
  def trimSpaceUtf8(s: U8): U8 = {
    if (s == null) return null
    val n = s.numBytes()
    if (n == 0) return s
    val first = s.getByte(0)
    val last = s.getByte(n - 1)
    if (first >= 0 && last >= 0 && !isAsciiGoSpace(first) && !isAsciiGoSpace(last)) return s
    var start = 0
    var end = n
    while (start < end && { val b = s.getByte(start); b >= 0 && isAsciiGoSpace(b) }) start += 1
    while (end > start && { val b = s.getByte(end - 1); b >= 0 && isAsciiGoSpace(b) }) end -= 1
    if (start == end) return org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
    // a non-ASCII boundary byte may start a multi-byte whitespace rune
    // (U+0085, U+00A0, ...): only the String path knows the full set
    if (s.getByte(start) < 0 || s.getByte(end - 1) < 0)
      return org.apache.spark.unsafe.types.UTF8String.fromString(trimSpace(s.toString))
    if (start == 0 && end == n) s
    else org.apache.spark.unsafe.types.UTF8String.fromBytes(s.getBytes, start, end - start)
  }

  /** `strconv.ParseInt(s, 10, 64)` over bytes: optional sign + ASCII
    * digits, null on syntax error or int64 overflow. Accumulates toward
    * MIN_VALUE like Long.parseLong so -9223372036854775808 round-trips. */
  def parseLongBoxedUtf8(s: U8): java.lang.Long = {
    if (s == null) return null
    val n = s.numBytes()
    if (n == 0) return null
    val b0 = s.getByte(0)
    val neg = b0 == '-'.toByte
    var i = if (neg || b0 == '+'.toByte) 1 else 0
    if (i >= n) return null
    val limit = if (neg) Long.MinValue else -Long.MaxValue
    val multmin = limit / 10
    var acc = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0'.toByte || b > '9'.toByte) return null
      val d = b - '0'.toByte
      if (acc < multmin) return null
      acc *= 10
      if (acc < limit + d) return null
      acc -= d
      i += 1
    }
    java.lang.Long.valueOf(if (neg) acc else -acc)
  }

  /** True iff the bytes form a plain decimal float literal — the subset of
    * the Go grammar with no underscores, hex, or inf/nan — for which
    * `Double.parseDouble` returns the same correctly-rounded IEEE value as
    * Go's `ParseFloat`. */
  private def isPlainDecimal(s: U8, n: Int): Boolean = {
    var i = 0
    val b0 = s.getByte(0)
    if (b0 == '+'.toByte || b0 == '-'.toByte) i = 1
    def digits(from: Int): Int = {
      var j = from
      while (j < n && { val b = s.getByte(j); b >= '0'.toByte && b <= '9'.toByte }) j += 1
      j
    }
    val intEnd = digits(i)
    var j = intEnd
    var fracDigits = 0
    if (j < n && s.getByte(j) == '.'.toByte) {
      val fracEnd = digits(j + 1)
      fracDigits = fracEnd - (j + 1)
      j = fracEnd
    }
    if (intEnd - i == 0 && fracDigits == 0) return false // no mantissa digits
    if (j < n) {
      val e = s.getByte(j)
      if (e != 'e'.toByte && e != 'E'.toByte) return false
      j += 1
      if (j < n && { val b = s.getByte(j); b == '+'.toByte || b == '-'.toByte }) j += 1
      val expEnd = digits(j)
      if (expEnd == j) return false // empty exponent
      j = expEnd
    }
    j == n
  }

  // 10^0..10^22 are exactly representable as doubles (5^22 < 2^53)
  private val Pow10 = Array.tabulate(23)(i => math.pow(10, i))

  /** `strconv.ParseFloat(s, 64)` as the reference uses it, over bytes:
    * plain decimals validated byte-wise then parsed; underscores/hex/
    * inf/nan fall back to the full String grammar. Overflow to ±Inf is a
    * parse failure, as in Go.
    *
    * Short decimals take the classic exact-power-of-ten path (the strtod
    * fast case): when the mantissa fits 2^53 and |decimal exponent| <=
    * 22, both operands of `mant * 10^e` / `mant / 10^-e` are exact
    * doubles, so the single IEEE multiply/divide is correctly rounded —
    * identical to Double.parseDouble, with no String alloc. Everything
    * else (long mantissas, big exponents) still goes through the JVM
    * parser. */
  def parseDoubleBoxedUtf8(s: U8): java.lang.Double = {
    if (s == null) return null
    val n = s.numBytes()
    if (n == 0) return null
    if (!isPlainDecimal(s, n)) return parseDoubleBoxed(s.toString)
    // second pass: accumulate mantissa/exponent for the exact fast case
    var i = 0
    val b0 = s.getByte(0)
    val neg = b0 == '-'.toByte
    if (neg || b0 == '+'.toByte) i = 1
    var mant = 0L
    var mantDigits = 0
    var exp10 = 0
    var exact = true
    while (i < n && { val b = s.getByte(i); b >= '0'.toByte && b <= '9'.toByte }) {
      if (mantDigits < 18) { mant = mant * 10 + (s.getByte(i) - '0'.toByte); mantDigits += 1 }
      else exact = false
      i += 1
    }
    if (i < n && s.getByte(i) == '.'.toByte) {
      i += 1
      while (i < n && { val b = s.getByte(i); b >= '0'.toByte && b <= '9'.toByte }) {
        if (mantDigits < 18) { mant = mant * 10 + (s.getByte(i) - '0'.toByte); mantDigits += 1; exp10 -= 1 }
        else exact = false
        i += 1
      }
    }
    if (i < n) { // exponent part (isPlainDecimal guarantees the shape)
      i += 1
      var esign = 1
      if (s.getByte(i) == '-'.toByte) { esign = -1; i += 1 }
      else if (s.getByte(i) == '+'.toByte) i += 1
      var e = 0
      while (i < n) {
        if (e < 10000) e = e * 10 + (s.getByte(i) - '0'.toByte)
        i += 1
      }
      exp10 += esign * e
    }
    if (exact && mant <= (1L << 53) && exp10 >= -22 && exp10 <= 22) {
      val v =
        if (exp10 >= 0) mant.toDouble * Pow10(exp10)
        else mant.toDouble / Pow10(-exp10)
      java.lang.Double.valueOf(if (neg) -v else v)
    } else {
      val d = java.lang.Double.parseDouble(s.toString)
      if (java.lang.Double.isInfinite(d)) null else java.lang.Double.valueOf(d)
    }
  }

  /** Reference bool test over bytes: ASCII case-insensitive true/false.
    * Any non-ASCII byte defers to the String path (Go lowercases runes;
    * no multi-byte rune lowercases into ASCII t/r/u/e, but the String
    * path stays the single source of truth for that claim). */
  def parseBoolBoxedUtf8(s: U8): java.lang.Boolean = {
    if (s == null) return null
    val n = s.numBytes()
    var i = 0
    while (i < n) { if (s.getByte(i) < 0) return parseBoolBoxed(s.toString); i += 1 }
    def eqLower(word: String): Boolean = {
      var j = 0
      while (j < n) {
        if ((s.getByte(j) | 0x20) != word.charAt(j).toInt) return false
        j += 1
      }
      true
    }
    if (n == 4 && eqLower("true")) java.lang.Boolean.TRUE
    else if (n == 5 && eqLower("false")) java.lang.Boolean.FALSE
    else null
  }
}
