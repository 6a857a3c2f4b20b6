package graft.core

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed k-gram fingerprint kernel behind the `winnow_fingerprints`
  * Catalyst expression (graft.functions.TextExpressions) — the q103
  * duplicated-span selector (Schleimer, Wilkerson & Aiken, SIGMOD 2003).
  *
  * Exists because the expression-HOF formulation (per-position md5 via
  * `transform(sequence(...))`, then `array_min(slice(...))` per window)
  * measured 241 s at the 100× corpus: one md5 is O(k) digest work plus a
  * substring copy, and every sliding window re-scans w hashes through a
  * fresh slice allocation — O(n·(k+w)) heavily-allocating work per doc.
  * This kernel is the O(n) classical form: one code-point pass, a ROLLING
  * Karp-Rabin hash (each position is one multiply-add from the previous),
  * and a monotonic-deque sliding minimum (each hash enters/leaves the
  * deque once).
  *
  * Cross-engine contract (the DuckDB oracle mirrors this arithmetic
  * term-by-term, so both engines produce identical int64 fingerprints):
  *  - hash of the k-gram at position p (0-based, over Unicode CODE
  *    POINTS): H(p) = sum_{j<k} cp(p+j) * B^(k-1-j) mod P, with
  *    B = 1000003 and P = 2^61-1 (Mersenne; 122-bit products reduce with
  *    shifts, and the oracle computes the same sum in 128-bit HUGEINT).
  *  - selection: for every window of `w` consecutive hash positions,
  *    select min(H) by signed int64 comparison (all values sit in
  *    [0, P), so signed = unsigned ordering on both engines).
  *  - output: the DISTINCT selected values, ascending (consumers
  *    aggregate over an explode, so order only needs determinism).
  *
  * Winnowing's guarantee: two documents sharing a run of >= k+w-1 code
  * points share at least one selected fingerprint, at ANY alignment —
  * the property a fixed-stride window scheme lacks.
  */
object Winnow {

  /** 2^61 - 1, prime. Also the 61-bit mask used for Mersenne reduction. */
  val P: Long = (1L << 61) - 1

  /** Hash base; any value well inside [2, P). */
  val B: Long = 1000003L

  /** (a * b) mod P for a, b in [0, P): split the 122-bit product at bit
    * 61 and fold (2^61 ≡ 1 mod P). */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // product < 2^122, so hi < 2^58
    val lo = a * b
    var x = (lo & P) + ((hi << 3) | (lo >>> 61))
    while (x >= P) x -= P
    x
  }

  /** [B^(k-1) mod P, ..., B^1, B^0] — the power table the DuckDB oracle
    * embeds as literals, generated HERE so both engines share one
    * arithmetic definition (the probeMasks discipline). */
  def powerTable(k: Int): Array[Long] = {
    val pw = new Array[Long](k)
    pw(k - 1) = 1L
    var j = k - 2
    while (j >= 0) { pw(j) = mulmod(pw(j + 1), B); j -= 1 }
    pw
  }

  /** Distinct winnowed fingerprints of `s` as ascending int64s; empty
    * array when the text is shorter than k+w-1 code points (no full
    * selection window exists — callers may also pre-filter). */
  def fingerprintsUtf8(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    // one pass: decode code points (UTF-16 aware, matching DuckDB's
    // per-code-point indexing for non-BMP input)
    val cps = new Array[Int](str.length)
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    val m = n - k + 1 // k-gram positions
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    // rolling hashes
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (mulmod(h, B) + cps(i)) % P; i += 1 }
    hs(0) = h
    val bk = powerTable(k)(0) // B^(k-1) mod P
    var p = 1
    while (p < m) {
      val drop = mulmod(cps(p - 1).toLong, bk)
      h = mulmod(h - drop + P - (if (h >= drop) P else 0), B)
      h = (h + cps(p + k - 1)) % P
      hs(p) = h
      p += 1
    }
    // monotonic-deque sliding minimum over windows of w hash positions
    val nw = m - w + 1
    val mins = new Array[Long](nw)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    p = 0
    while (p < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(p)) tail -= 1
      deque(tail) = p; tail += 1
      if (deque(head) <= p - w) head += 1
      if (p >= w - 1) mins(p - w + 1) = hs(deque(head))
      p += 1
    }
    // distinct ascending
    java.util.Arrays.sort(mins)
    var out = 1
    i = 1
    while (i < nw) {
      if (mins(i) != mins(out - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}
