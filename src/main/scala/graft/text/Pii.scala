package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — a standard pre-training
  * corpus scrub pass (the reference's curation surface stops at quality
  * flags; this extends it the way public pipeline writeups do: regex
  * families for emails / IPv4 / SSN-shaped ids / NANP-shaped phones).
  *
  * Patterns deliberately use only portable regex constructs (character
  * classes, bounded quantifiers, ASCII `\b`) with identical semantics in
  * Java's engine and RE2, so an external SQL engine reproduces the match
  * set exactly. Everything is a codegen'd `regexp_replace`/`regexp_count`
  * projection — no shuffle, no UDF; the pass scans each partition once and
  * scales linearly.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The four (pattern, replacement) families, applied in this fixed order
    * (email first — its local part may contain digits that the numeric
    * families would otherwise nibble at).
    */
  val Families: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>",
    Ipv4Re -> "<IP>",
    SsnRe -> "<SSN>",
    PhoneRe -> "<PHONE>")

  /** Redact all families from `text`. */
  def redact(text: Column): Column =
    Families.foldLeft(text) { case (c, (re, repl)) =>
      regexp_replace(c, re, repl)
    }

  /** Adds per-family match counts (computed on the ORIGINAL text) and the
    * redacted text: n_email, n_ip, n_ssn, n_phone, redacted.
    */
  def withPiiRedaction(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("n_email", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_ip", regexp_count(t, lit(Ipv4Re)).cast("long"))
      .withColumn("n_ssn", regexp_count(t, lit(SsnRe)).cast("long"))
      .withColumn("n_phone", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("redacted", redact(t))
  }
}
