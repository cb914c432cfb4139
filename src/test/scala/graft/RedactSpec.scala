package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Redact

/** PII scrub (ext/Redact): placeholder substitution, match counting,
  * word-boundary anchoring, and the email-before-IP replacement order.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Redact.redact(col("t"))).as[String].head()

  private def countOne(s: String, pat: String): Long =
    Seq(s).toDF("t").select(Redact.countMatches(col("t"), pat)).as[Long].head()

  test("all three PII classes redact to typed placeholders") {
    assert(redactOne("mail a.b+c@ex-ample.co.uk from 192.168.0.1 or 555-123-4567")
      === "mail <EMAIL> from <IP> or <PHONE>")
  }

  test("every occurrence is replaced, not just the first") {
    assert(redactOne("x@y.com then z@w.org") === "<EMAIL> then <EMAIL>")
    assert(countOne("x@y.com then z@w.org", Redact.EmailPattern) === 2L)
  }

  test("word boundaries keep patterns off longer digit runs") {
    // 5-digit run before the phone shape; 4-part form with a 4-digit tail
    assert(countOne("12345-123-4567", Redact.PhonePattern) === 0L)
    assert(countOne("1.2.3.45678", Redact.Ipv4Pattern) === 0L)
  }

  test("emails redact before IPs: dotted hosts never half-match as IPs") {
    // host 10.0.0.1-style inside an email must disappear with the email
    assert(redactOne("u@10.0.0.1234.com") === "<EMAIL>")
  }

  test("phones with dot and space separators both match") {
    assert(redactOne("call 555.123.4567 or 555 123 4567")
      === "call <PHONE> or <PHONE>")
  }

  test("clean text passes through untouched with zero counts") {
    val s = "no pii here, just words and numbers like 42 or 3.14"
    assert(redactOne(s) === s)
    assert(countOne(s, Redact.EmailPattern) === 0L)
    assert(countOne(s, Redact.PhonePattern) === 0L)
    assert(countOne(s, Redact.Ipv4Pattern) === 0L)
  }
}
