package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Declared, Tables}

/** PII redaction — the scrub step every compliant training-data
  * pipeline runs before tokenization (emails, phone numbers, IP
  * addresses → typed placeholder tokens, with per-doc audit counts).
  *
  * Entirely row-local: three `regexp_replace`/`regexp_extract_all`
  * chains inside whole-stage codegen — no shuffle, no UDF, scales
  * linearly with the scan at any corpus size.
  *
  * The patterns restrict themselves to the regex intersection of
  * Java's engine (Spark) and RE2 (DuckDB): character classes,
  * bounded repetition, alternation — no backrefs, no lookarounds —
  * so the oracle replays them verbatim. The synthetic corpus contains
  * no PII (counts are all zero there); the SPEC plants real emails /
  * phones / IPs and verifies both the counts and the scrubbed text,
  * which is where the semantics are actually proven. */
object Redaction {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"

  /** Per-doc scrub: typed placeholders + audit counts. Emails are
    * scrubbed before phones so a numeric local-part is not re-matched;
    * the counts are taken on the ORIGINAL text, independently. */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(IpRe), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"),
      length(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "[EMAIL]"),
            IpRe, "[IP]"),
          PhoneRe, "[PHONE]")).as("scrubbed_chars"))
      .orderBy(col("doc_id"))

  /** Scrubbed text itself (not declared — array-free audit columns are
    * the oracle surface; the text path is spec-verified). */
  def scrubbedText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "[EMAIL]"),
          IpRe, "[IP]"),
        PhoneRe, "[PHONE]").as("text"))

  val declared: Seq[Declared] = Seq(
    Declared(
      "q140_pii_scrub",
      (s, dir) => scrub(Tables.load(s, dir, "documents")),
      Some(s"""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '$IpRe')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
        |    '$EmailRe', '[EMAIL]', 'g'),
        |    '$IpRe', '[IP]', 'g'),
        |    '$PhoneRe', '[PHONE]', 'g')) AS INT) AS scrubbed_chars
        |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "PII redaction audit: email/IP/phone counts + scrubbed length (row-local, codegen)")
  )
}
