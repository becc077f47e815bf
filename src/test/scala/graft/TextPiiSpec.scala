package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** PII scrubbing: placeholder substitution, class precedence, and hit
  * counting. Spec-only (the synthetic corpus contains no PII by
  * construction — a harness query would assert nothing). */
class TextPiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).head().getString(0)
  }

  private def counts(s: String): (Int, Int, Int) = {
    import spark.implicits._
    val r = Seq(s).toDF("text")
      .select(TextAnalysis.piiCounts(col("text")).as("c"))
      .select("c.n_email", "c.n_ip", "c.n_phone").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("each class is replaced with its typed placeholder") {
    assert(redact("contact jane.doe+x@example.co.uk today")
      == "contact [EMAIL] today")
    assert(redact("server at 192.168.10.12 responded")
      == "server at [IP] responded")
    assert(redact("call +1 (555) 123-4567 now") == "call [PHONE] now")
    assert(redact("id 123456789 leaked") == "id [PHONE] leaked")
  }

  test("precedence: emails keep their digits, dotted quads are IPs not phones") {
    // the email's digits must not survive as a separate phone hit
    assert(redact("user12345678@host.com") == "[EMAIL]")
    // a dotted quad is one IP, not a digit-run phone
    assert(redact("10.20.30.40") == "[IP]")
    // mixed sentence: every class lands on its own placeholder
    assert(redact("mail a@b.io from 10.0.0.1 or dial 0123-456-789")
      == "mail [EMAIL] from [IP] or dial [PHONE]")
  }

  test("hit counts follow the same precedence chain") {
    assert(counts("mail a@b.io from 10.0.0.1 or dial 0123-456-789") == ((1, 1, 1)))
    assert(counts("10.20.30.40 and 1.2.3.4") == ((0, 2, 0)))
    assert(counts("user12345678@host.com") == ((1, 0, 0)))
  }

  test("clean text passes through untouched") {
    val s = "the quick brown fox jumps over 7 lazy dogs in v2.1"
    assert(redact(s) == s)
    assert(counts(s) == ((0, 0, 0)))
  }
}
