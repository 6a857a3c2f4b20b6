package graft.core

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level falsifiability for [[Winnow]], independent of the DuckDB
  * oracle: the O(n) rolling-hash + deque implementation must agree with
  * a direct quadratic reference (per-window Σ c·B^j mod P via BigInt,
  * naive min scan), and the winnowing guarantee must hold on seeded
  * random shared runs at arbitrary alignments.
  */
class WinnowSpec extends AnyFunSuite {

  private val K = 20
  private val W = 8

  private def kernel(s: String): Set[Long] = {
    val arr = Winnow.fingerprintsUtf8(UTF8String.fromString(s), K, W)
    (0 until arr.numElements()).map(arr.getLong).toSet
  }

  /** Direct BigInt reference: no rolling, no deque, no Mersenne trick. */
  private def reference(s: String): Set[Long] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    val m = n - K + 1
    if (m < W) return Set.empty
    val P = BigInt(2).pow(61) - 1
    val B = BigInt(Winnow.B)
    val hs = (0 until m).map { p =>
      (0 until K).map(j => BigInt(cps(p + j)) * B.pow(K - 1 - j)).sum.mod(P).toLong
    }
    (0 to m - W).map(p => hs.slice(p, p + W).min).toSet
  }

  test("kernel agrees with the direct BigInt reference on seeded fuzz strings") {
    val rnd = new scala.util.Random(42)
    // alphabets as code-point seqs so non-BMP sampling can never split a
    // surrogate pair into an invalid string
    val alphabets: Seq[IndexedSeq[String]] = Seq(
      "abcdefghijklmnopqrstuvwxyz 0123456789",
      "ab",                       // heavy repetition -> many hash ties
      "aeiouäöüßéñ中文字符αβγ",      // multi-byte UTF-8
      "a😀b c")         // non-BMP (surrogate pairs)
    .map(a => a.codePoints().toArray.toIndexedSeq.map(Character.toString))
    for (a <- alphabets; len <- Seq(0, 5, 26, 27, 28, 50, 300, 2000)) {
      val s = (0 until len).map(_ => a(rnd.nextInt(a.length))).mkString
      assert(kernel(s) == reference(s), s"mismatch on len=$len alphabet=${a.mkString}")
    }
  }

  test("power table matches BigInt modpow") {
    val P = BigInt(2).pow(61) - 1
    val pw = Winnow.powerTable(K)
    for (j <- 0 until K)
      assert(BigInt(pw(j)) == BigInt(Winnow.B).modPow(K - 1 - j, P))
  }

  test("guarantee: any shared run of >= k+w-1 code points yields a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    def rand(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 50) {
      val shared = rand(K + W - 1 + rnd.nextInt(40))
      val docA = rand(rnd.nextInt(80)) + shared + rand(rnd.nextInt(80))
      val docB = rand(rnd.nextInt(80)) + shared + rand(rnd.nextInt(80))
      assert(kernel(docA).intersect(kernel(docB)).nonEmpty,
        s"trial $trial: shared ${shared.length}-char run produced no common fingerprint")
    }
  }

  test("short inputs produce no fingerprints") {
    assert(kernel("") == Set.empty)
    assert(kernel("a" * (K + W - 2)) == Set.empty)
    assert(kernel("a" * (K + W - 1)).nonEmpty)
  }
}
