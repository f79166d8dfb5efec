package graft.text

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("each family is counted on original text and redacted in order") {
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "server 10.0.255.1 and 192.168.1.1 up"),
      (3L, "ssn 123-45-6789 phone 555-867-5309"),
      (4L, "clean text, no pii at all"),
      (5L, "two mails a@b.io c@d.org one ip 1.2.3.4")
    ).toDF("id", "text")
    val out = Pii.withPiiRedaction(df, "text")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6)))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L, "mail <EMAIL> now")))
    assert(out(2L) == ((0L, 2L, 0L, 0L, "server <IP> and <IP> up")))
    assert(out(3L) == ((0L, 0L, 1L, 1L, "ssn <SSN> phone <PHONE>")))
    assert(out(4L) == ((0L, 0L, 0L, 0L, "clean text, no pii at all")))
    assert(out(5L) == ((2L, 1L, 0L, 0L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("email wins over the numeric families inside its local part") {
    // digits inside an address must not be double-redacted as phone/ssn
    val df = Seq((1L, "contact 123-45-6789@example.com today")).toDF("id", "text")
    val out = Pii.withPiiRedaction(df, "text").collect().head
    assert(out.getString(6) == "contact <EMAIL> today")
    assert(out.getLong(2) == 1L) // n_email
    // counts run on the ORIGINAL text, where the ssn-shaped local part still
    // matches (`@` is a non-word char, so \b holds) — only the fixed family
    // order in redact() keeps the output text from double-redacting
    assert(out.getLong(4) == 1L) // n_ssn
  }

  test("ssn-shaped and phone-shaped patterns do not cross-match") {
    val df = Seq((1L, "123-45-6789 555-867-5309")).toDF("id", "text")
    val out = Pii.withPiiRedaction(df, "text").collect().head
    assert(out.getLong(4) == 1L && out.getLong(5) == 1L)
    assert(out.getString(6) == "<SSN> <PHONE>")
  }
}
