package graft

import graft.text.Dlp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for PII scan/redact (values pinned by the oracle). */
class DlpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("scan: classification ladder follows the finding counts") {
    val rows = Dlp.piiScan(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cls = r.getAs[String]("classification")
      if (r.getAs[Long]("n_ssns") > 0) assert(cls == "RESTRICTED")
      else if (r.getAs[Long]("n_emails") + r.getAs[Long]("n_phones") > 0)
        assert(cls == "CONFIDENTIAL")
      else assert(cls == "INTERNAL")
    }
    // the doc_id planting guarantees every class occurs
    assert(rows.map(_.getAs[String]("classification")).distinct.length == 3)
  }

  test("redact: no scannable PII survives redaction") {
    val redacted = Dlp.piiRedact(spark, dir)
      .select(col("doc_id"), col("redacted_text").as("text"))
    val rescan = Dlp.scanText(redacted)
    assert(rescan.filter(col("n_findings") > 0).count() == 0,
      "redacted text still matches a PII pattern")
  }

  test("redact catches 1-char local-part emails the keep-2 mask cannot") {
    import spark.implicits._
    val docs = Seq((1L, "reach me at a@example.com or bob@corp.io")).toDF("doc_id", "text")
    val out = Dlp.redactText(docs).head()
    assert(out.getAs[Long]("n_redactions") == 2)
    val t = out.getAs[String]("redacted_text")
    assert(t.contains("***@example.com") && t.contains("bo***@corp.io"), t)
    assert(Dlp.scanText(Dlp.redactText(docs).select(col("doc_id"), col("redacted_text").as("text")))
      .head().getAs[Long]("n_findings") == 0)
  }

  test("redact masks keep the disclosure-safe tail only") {
    val sample = Dlp.piiRedact(spark, dir)
      .filter(col("n_redactions") > 0).head()
    val t = sample.getAs[String]("redacted_text")
    assert(t.contains("***"), s"no mask found in: ${t.takeRight(80)}")
  }
}
