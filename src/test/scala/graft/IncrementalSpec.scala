package graft

import graft.operators.Incremental
import org.scalatest.funsuite.AnyFunSuite

/** Incremental operators (reference incremental_etl_processor.py): watermark
  * extract keeps only newer rows and stamps the batch high-water mark; the
  * checksum snapshot diff classifies all four change types including
  * deletes. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("extractSince keeps rows strictly after the watermark and stamps max ts") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-15 12:00:00")),
      (3L, ts("2024-01-20 00:00:00")), // exactly at watermark: excluded
      (4L, ts("2024-01-25 08:00:00"))
    ).toDF("id", "ts")
    val out = Incremental.extractSince(df, "ts", "2024-01-20 00:00:00")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set(4L -> "2024-01-25 08:00:00"))
  }

  test("snapshotDiff classifies insert/update/delete/no_change") {
    import spark.implicits._
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val inc = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val out = Incremental.snapshotDiff(cur, inc, Seq("k"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getAs[String]("change_type"))).toMap
    assert(out == Map(1L -> "no_change", 2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("driver query snapshot_diff covers every customer exactly once") {
    val out = Incremental.snapshotDiffCustomers(spark, TestSpark.sfDir)
    assert(out.count() == Tables.customer(spark, TestSpark.sfDir).count())
    val types = out.groupBy("change_type").count().collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "update", "delete", "no_change"))
  }
}
