package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text corpus (reference:
  * src/core/security/enterprise_dlp.py — `SensitiveDataDetector`:156-410
  * regex pattern scan with a classification ladder, and
  * `DataRedactionEngine`/`_redact_text`:412-520 mask-style redaction).
  * Scrubbing PII out of web-scale text is a core training-data-pipeline
  * stage; both operators are pure per-row projections — no shuffle, they
  * scale with scan bandwidth alone.
  *
  * The synthetic corpus carries no PII, so the driver queries plant
  * deterministic PII derived from doc_id (emails on ‰5, phones on ‰7, SSNs
  * on ‰11 — the snapshot_diff synthetic-drift convention) and then scan and
  * redact it; the operators themselves take ANY text column.
  *
  * Redaction masks are fixed-width (`jo***@domain`, `***-**-1234`) — the
  * reference pads stars to the original length, which needs a per-match
  * computed replacement; a fixed mask keeps the operator one codegen'd
  * regexp_replace chain (and redacts MORE, never less). Patterns avoid
  * engine-specific regex syntax (character classes and bounded quantifiers
  * only — Java regex and RE2 agree on these).
  */
object Dlp {

  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePat = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
  val ssnPat = "\\d{3}-\\d{2}-\\d{4}"

  /** doc_id-derived planted PII (deterministic, both engines reproduce it). */
  private def planted(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
      col("doc_id"), col("lang"), col("source"),
      concat(
        col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(""),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-123-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(""),
        when(col("doc_id") % 11 === 0,
          concat(lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise("")).as("text"))
  }

  /** Per-document PII scan: occurrence counts per sensitive type plus the
    * reference's classification ladder (SSN ⇒ RESTRICTED, email/phone ⇒
    * CONFIDENTIAL, else INTERNAL — `_determine_classification`:393-410). */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    scanText(planted(spark, dir))

  /** Library surface: scan any (doc_id, text) frame. */
  def scanText(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
        col("doc_id"),
        regexp_count(t, lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(t, lit(phonePat)).cast("long").as("n_phones"),
        regexp_count(t, lit(ssnPat)).cast("long").as("n_ssns"))
      .withColumn("n_findings", col("n_emails") + col("n_phones") + col("n_ssns"))
      .withColumn("classification",
        when(col("n_ssns") > 0, "RESTRICTED")
          .when(col("n_emails") + col("n_phones") > 0, "CONFIDENTIAL")
          .otherwise("INTERNAL"))
  }

  /** Mask-style redaction: SSN → `***-**-last4`, phone → `***-***-last4`,
    * email → first-2 + `***` + domain (reference `_redact_text`:412-440,
    * fixed-width masks — see object note). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    redactText(planted(spark, dir))

  def redactText(docs: DataFrame): DataFrame = {
    val t = col("text")
    // the catch-all email pass (`***@domain`) runs AFTER the keep-2 pass and
    // only reaches 1-char local parts: a local already masked to `xx***` ends
    // in '*', which is outside the local-part class, so it cannot re-match
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t,
              "([A-Za-z0-9._%+-]{2})[A-Za-z0-9._%+-]*@([A-Za-z0-9.-]+\\.[A-Za-z]{2,})", "$1***@$2"),
            "[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,})", "***@$1"),
          "\\d{3}[-.]\\d{3}[-.](\\d{4})", "***-***-$1"),
        "\\d{3}-\\d{2}-(\\d{4})", "***-**-$1").as("redacted_text"),
      (regexp_count(t, lit(emailPat)) + regexp_count(t, lit(phonePat)) +
        regexp_count(t, lit(ssnPat))).cast("long").as("n_redactions"))
  }

  private def plantedSql: String =
    """SELECT doc_id,
      |  text ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
      |    CASE WHEN doc_id % 7 = 0
      |         THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0
      |         THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    AS text
      |FROM documents""".stripMargin

  def piiScanOracle: String =
    s"""WITH planted AS (
      |$plantedSql
      |), s AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |    CAST(len(regexp_extract_all(text, '\\d{3}[-.]\\d{3}[-.]\\d{4}')) AS BIGINT) AS n_phones,
      |    CAST(len(regexp_extract_all(text, '\\d{3}-\\d{2}-\\d{4}')) AS BIGINT) AS n_ssns
      |  FROM planted
      |)
      |SELECT doc_id, n_emails, n_phones, n_ssns,
      |  n_emails + n_phones + n_ssns AS n_findings,
      |  CASE WHEN n_ssns > 0 THEN 'RESTRICTED'
      |       WHEN n_emails + n_phones > 0 THEN 'CONFIDENTIAL'
      |       ELSE 'INTERNAL' END AS classification
      |FROM s""".stripMargin

  def piiRedactOracle: String =
    s"""WITH planted AS (
      |$plantedSql
      |), s AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) +
      |    CAST(len(regexp_extract_all(text, '\\d{3}[-.]\\d{3}[-.]\\d{4}')) AS BIGINT) +
      |    CAST(len(regexp_extract_all(text, '\\d{3}-\\d{2}-\\d{4}')) AS BIGINT) AS n_redactions,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(text,
      |            '([A-Za-z0-9._%+-]{2})[A-Za-z0-9._%+-]*@([A-Za-z0-9.-]+\\.[A-Za-z]{2,})', '\\1***@\\2', 'g'),
      |          '[A-Za-z0-9._%+-]+@([A-Za-z0-9.-]+\\.[A-Za-z]{2,})', '***@\\1', 'g'),
      |        '\\d{3}[-.]\\d{3}[-.](\\d{4})', '***-***-\\1', 'g'),
      |      '\\d{3}-\\d{2}-(\\d{4})', '***-**-\\1', 'g') AS redacted_text
      |  FROM planted
      |)
      |SELECT doc_id, redacted_text, n_redactions FROM s""".stripMargin
}
