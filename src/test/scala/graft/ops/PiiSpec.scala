package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the PII class disjointness the q70 oracle relies on: each
  * pattern matches only its own class, so redaction order can never
  * change the counts. */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scan(text: String): (Long, Long, Long, Long, String) = {
    import spark.implicits._
    val r = TextAnalysis.piiRedact(Seq((1L, text)).toDF("id", "text")).head()
    (r.getAs[Long]("n_emails"), r.getAs[Long]("n_ssns"),
      r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"),
      r.getAs[String]("redacted"))
  }

  test("SSN digit grouping (3-2-4) is not a phone (3-3-4) and vice versa") {
    assert(scan("123-45-6789") === ((0L, 1L, 0L, 0L, "<SSN>")))
    assert(scan("555-123-4567") === ((0L, 0L, 1L, 0L, "<PHONE>")))
  }

  test("dotted phone is not an IPv4 (three dotted runs, not four)") {
    assert(scan("555.987.6543") === ((0L, 0L, 1L, 0L, "<PHONE>")))
    assert(scan("10.20.30.40") === ((0L, 0L, 0L, 1L, "<IP>")))
  }

  test("email local part keeps dots/plus; domain backtracks to the TLD") {
    assert(scan("bob.smith+spam@mail.co!") === ((1L, 0L, 0L, 0L, "<EMAIL>!")))
  }

  test("word boundaries: digit runs embedded in longer numbers don't match") {
    assert(scan("order 9555-123-45678 shipped") ===
      ((0L, 0L, 0L, 0L, "order 9555-123-45678 shipped")))
  }

  test("multiple classes in one text redact independently") {
    assert(scan("a@b.io saw 1.2.3.4 and 999-88-7777") ===
      ((1L, 1L, 0L, 1L, "<EMAIL> saw <IP> and <SSN>")))
  }

  test("overlapping classes: counts describe the redaction, not the raw text") {
    // an SSN-shaped email local part counts once, as the email it is
    assert(scan("123-45-6789@x.co") === ((1L, 0L, 0L, 0L, "<EMAIL>")))
    // an IP-literal domain is NOT an email under this grammar (no
    // alphabetic TLD) — the IP inside it still gets scrubbed
    assert(scan("user@1.2.3.4") === ((0L, 0L, 0L, 1L, "user@<IP>")))
  }
}
