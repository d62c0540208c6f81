package graft

import graft.sources.Bronze
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class BronzeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column name normalization handles the reference's header variants") {
    assert(Bronze.normalizeName("InvoiceNo") == "invoice_no")
    assert(Bronze.normalizeName("StockCode") == "stock_code")
    assert(Bronze.normalizeName("UnitPrice") == "unit_price")
    assert(Bronze.normalizeName("CustomerID") == "customer_id")
    assert(Bronze.normalizeName("Invoice Date ") == "invoice_date")
    assert(Bronze.normalizeName("weird--Header  (x)") == "weird_header_x")
  }

  test("csv roundtrip: read with schema, stamp metadata, write partitioned, read back") {
    val tmp = java.nio.file.Files.createTempDirectory("bronze").toString
    val csv = s"$tmp/raw.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      """InvoiceNo,StockCode,Quantity,UnitPrice,InvoiceDate
        |A1,S1,2,3.5,1/2/2024 10:30
        |A2,S2,1,9.0,1/3/2024 11:00
        |A3,S3,not_a_number,1.0,1/4/2024 12:00
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("InvoiceNo", StringType), StructField("StockCode", StringType),
      StructField("Quantity", IntegerType), StructField("UnitPrice", DoubleType),
      StructField("InvoiceDate", TimestampType)))
    val df = Bronze.readCsv(spark, schema, jobId = "test-job", paths = Seq(csv))
    assert(df.columns.toSet ==
      Set("invoice_no", "stock_code", "quantity", "unit_price", "invoice_date",
        "source_file_path", "source_file_type", "ingestion_job_id", "ingestion_timestamp"))
    assert(df.count() == 3)
    // PERMISSIVE: the bad quantity nulls out instead of failing the job
    assert(df.filter(col("invoice_no") === "A3" && col("quantity").isNull).count() == 1)

    val out = s"$tmp/bronze"
    Bronze.writePartitioned(
      df.withColumn("ingest_date", to_date(col("invoice_date"))), out, Seq("ingest_date"))
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
    assert(back.select("ingest_date").distinct().count() == 3) // partition column survives
  }

  test("partition filters prune the scan (no full-table read for one day)") {
    val tmp = java.nio.file.Files.createTempDirectory("bronzeprune").toString
    import spark.implicits._
    val df = Seq(("a", "2024-01-01"), ("b", "2024-01-02"), ("c", "2024-01-03"))
      .toDF("v", "d").withColumn("d", to_date(col("d")))
    Bronze.writePartitioned(df, tmp, Seq("d"))
    val q = spark.read.parquet(tmp).filter(col("d") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("isnotnull(d"),
      s"partition filter not pushed:\n$plan")
    assert(q.count() == 1)
  }
}
