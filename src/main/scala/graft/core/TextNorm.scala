package graft.core

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Byte-wise text normalization / tokenization kernels behind the
  * `normalize_text` and `split_whitespace` Catalyst expressions
  * (graft.functions.TextExpressions).
  *
  * Both exist because the 100× dedup-family scale run showed the regex
  * formulations dominating: q31's fingerprint chain
  * (`lower → regexp_replace ×2 → trim`) was 16.7 s of pure regex compute
  * at 500 k docs, and every dedup/text query pays `regexp_extract_all
  * (text, "\\S+")` before it does anything else. Java regex walks chars
  * through a backtracking NFA and allocates a String per token; these
  * kernels are single passes over the UTF8String bytes.
  *
  * Equivalence contracts (each pinned bit-for-bit by TextNormSpec's
  * seeded fuzz corpus against the original Column chains):
  *  - normalize: `trim(regexp_replace(regexp_replace(lower(c),
  *    "[^a-z0-9 ]", ""), "\\s+", " "))`. ASCII input takes the one-pass
  *    byte loop; any high byte falls back to the literal original
  *    pipeline (same UTF8String.toLowerCase, same java.util.regex
  *    patterns) so Unicode edge cases (multi-char lowercase expansions
  *    like İ → i+U+0307) cannot diverge.
  *  - split: `regexp_extract_all(c, "\\S+", 0)`. Java's `\s` is the
  *    ASCII set [ \t\n\x0B\f\r] and UTF-8 continuation bytes are ≥ 0x80,
  *    so the byte loop is exact for ALL input — no fallback needed.
  */
object TextNorm {

  private val StripPattern = java.util.regex.Pattern.compile("[^a-z0-9 ]")
  private val WsRunPattern = java.util.regex.Pattern.compile("\\s+")

  /** Lowercase → keep [a-z0-9 ] → collapse space runs → trim, fused into
    * one pass for ASCII input. Dropped characters do NOT become spaces
    * ("a.b" → "ab"), matching the strip-then-collapse order of the
    * original chain. */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val out = new Array[Byte](n)
    var j = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = s.getByte(i)
      if (b < 0) return normalizeSlow(s) // non-ASCII byte: exact fallback
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && j > 0) { out(j) = ' '; j += 1 }
        out(j) = b
        j += 1
        pendingSpace = false
      } else if (b == ' ') {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, j)
  }

  /** The original expression chain verbatim: Spark's Lower (UTF8_BINARY)
    * is `UTF8String.toLowerCase`, RegExpReplace runs java.util.regex over
    * `toString()`, StringTrim is `UTF8String.trim`. After the strip step
    * only [a-z0-9 ] survives, so the collapse/trim tail is ASCII-safe. */
  private def normalizeSlow(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val stripped = StripPattern.matcher(lowered).replaceAll("")
    val collapsed = WsRunPattern.matcher(stripped).replaceAll(" ")
    UTF8String.fromString(collapsed).trim()
  }

  private def isWs(b: Byte): Boolean = b == ' ' || (b >= 9 && b <= 13)

  /** `size(regexp_extract_all(c, "\\S+", 0))` without materializing the
    * token array — the count-only form the stats/accounting queries use. */
  def countTokensUtf8(s: UTF8String): Long = {
    val n = s.numBytes
    var count = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(s.getByte(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWs(s.getByte(i))) i += 1 }
    }
    count
  }

  private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** `size(regexp_extract_all(c, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0))`
    * as one byte pass — the BPE-ish pre-token count. The symbol
    * alternative matches one CHARACTER (not byte), so multi-byte UTF-8
    * sequences advance by their lead-byte length: exactly one count per
    * code point, like the regex. (Regex alternation order means a letter
    * run wins over the single-char class, digits likewise — mirrored by
    * branching on the class first.) */
  def countBpeTokensUtf8(s: UTF8String): Long = {
    val n = s.numBytes
    var count = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isAlpha(b)) { count += 1; i += 1; while (i < n && isAlpha(s.getByte(i))) i += 1 }
      else if (isDigit(b)) { count += 1; i += 1; while (i < n && isDigit(s.getByte(i))) i += 1 }
      else if (isWs(b)) i += 1
      else {
        count += 1
        // one code point: ASCII 1 byte; UTF-8 lead byte 110xxxxx → 2,
        // 1110xxxx → 3, 11110xxx → 4 (continuation bytes can't start a
        // match — valid UTF8String input always decodes from a lead byte)
        val u = b & 0xFF
        i += (if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4)
      }
    }
    count
  }

  private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') || b == '_'

  private val WordPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  /** `size(regexp_extract_all(c, "\\b(w1|w2|...)\\b", 0))` for a fixed
    * lowercase word list. ASCII input takes a one-byte-pass run match:
    * maximal `[a-zA-Z0-9_]` runs are exactly the `\b`-delimited words,
    * compared byte-for-byte against each candidate (case-sensitive, like
    * the pattern; lists here are ≤ 7 entries so a linear probe beats any
    * hash). Any byte ≥ 0x80 falls back to the literal compiled pattern,
    * because Java's `\b` is UNICODE-aware even though its `\w` is ASCII —
    * "aK" with a Kelvin sign has no boundary after the 'a' — and that
    * quirk is not worth reimplementing byte-wise. Used by the quality
    * score (stopword density) and lang-ID (marker-word hits). */
  def countWordsUtf8(s: UTF8String, words: Array[Array[Byte]]): Long = {
    val n = s.numBytes
    var count = 0L
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return countWordsSlow(s, words)
      while (i < n && !isWordByte(s.getByte(i)) && s.getByte(i) >= 0) i += 1
      if (i < n && s.getByte(i) < 0) return countWordsSlow(s, words)
      if (i < n) {
        val start = i
        while (i < n && isWordByte(s.getByte(i))) i += 1
        // a run ending at a non-ASCII byte has no ASCII-decidable boundary
        if (i < n && s.getByte(i) < 0) return countWordsSlow(s, words)
        val len = i - start
        var w = 0
        var matched = false
        while (!matched && w < words.length) {
          val cand = words(w)
          if (cand.length == len) {
            var j = 0
            while (j < len && cand(j) == s.getByte(start + j)) j += 1
            matched = j == len
          }
          w += 1
        }
        if (matched) count += 1
      }
    }
    count
  }

  private def countWordsSlow(s: UTF8String, words: Array[Array[Byte]]): Long = {
    val key = words.map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).mkString("|")
    var p = WordPatterns.get(key)
    if (p == null) {
      p = java.util.regex.Pattern.compile("\\b(" + key + ")\\b")
      WordPatterns.put(key, p)
    }
    val m = p.matcher(s.toString)
    var count = 0L
    while (m.find()) count += 1
    count
  }

  /** `length(regexp_replace(c, "[a-zA-Z0-9\\s]", ""))` — the count of
    * CODE POINTS outside ASCII alnum/whitespace (Spark `length` counts
    * characters; a multi-byte sequence is one). Lead-byte walk, exact
    * for valid UTF-8. The punctuation-ratio numerator. */
  def countNonAlnumCharsUtf8(s: UTF8String): Long = {
    val n = s.numBytes
    var count = 0L
    var i = 0
    while (i < n) {
      val u = s.getByte(i) & 0xFF
      if (u < 0x80) {
        if (!((u >= 'a' && u <= 'z') || (u >= 'A' && u <= 'Z') ||
              (u >= '0' && u <= '9') || u == ' ' || (u >= 9 && u <= 13))) count += 1
        i += 1
      } else {
        count += 1
        i += (if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4)
      }
    }
    count
  }

  /** `length(regexp_replace(c, "\\s", ""))` — code points that are not
    * ASCII whitespace. The avg-token-length numerator. */
  def countNonWsCharsUtf8(s: UTF8String): Long = {
    val n = s.numBytes
    var count = 0L
    var i = 0
    while (i < n) {
      val u = s.getByte(i) & 0xFF
      if (u < 0x80) {
        if (!(u == ' ' || (u >= 9 && u <= 13))) count += 1
        i += 1
      } else {
        count += 1
        i += (if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4)
      }
    }
    count
  }

  private val EmptyTokens = new GenericArrayData(new Array[Any](0))

  /** `\S+` token runs as zero-copy slices over one shared byte array. */
  def splitWhitespaceUtf8(s: UTF8String): GenericArrayData = {
    val n = s.numBytes
    if (n == 0) return EmptyTokens
    val bytes = s.getBytes // one copy out of the row buffer; slices share it
    var count = 0
    var i = 0
    while (i < n) { // first pass: token count (avoids growable buffers)
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) { count += 1; while (i < n && !isWs(bytes(i))) i += 1 }
    }
    if (count == 0) return EmptyTokens
    val toks = new Array[Any](count)
    var t = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        toks(t) = UTF8String.fromBytes(bytes, start, i - start)
        t += 1
      }
    }
    new GenericArrayData(toks)
  }
}
