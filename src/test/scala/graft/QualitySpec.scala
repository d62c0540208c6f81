package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("generic profiler: one row per column, correct null accounting") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.5)), (2L, None, Some(2.5)), (3L, Some("c"), None)
    ).toDF("id", "s", "v")
    val p = Quality.profile(df).collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    assert(p("id").getAs[Long]("null_count") == 0)
    assert(p("s").getAs[Long]("null_count") == 1)
    assert(p("v").getAs[Long]("null_count") == 1)
    assert(math.abs(p("s").getAs[Double]("completeness") - 2.0 / 3) < 1e-12)
    assert(p("id").getAs[String]("min_value") == "1")
    assert(p("id").getAs[String]("max_value") == "3")
  }

  test("profiler runs single-pass over a real table") {
    val p = Quality.profile(Tables.orders(spark, TestSpark.sfDir))
    assert(p.count() == 6)
    assert(p.filter(col("null_count") =!= 0).count() == 0)
  }

  test("change detection classifies insert/update/no_change") {
    import spark.implicits._
    val current = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "attr", "amount")
    val incoming = Seq(
      (1L, "a", 10.0),   // unchanged
      (2L, "b", 99.0),   // updated
      (4L, "d", 40.0))   // new
      .toDF("k", "attr", "amount")
    val out = Quality.detectChanges(current, incoming, Seq("k"), Seq("attr", "amount"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(out == Map(1L -> "no_change", 2L -> "update", 4L -> "insert"))
  }

  test("change detection treats null attribute values distinctly") {
    import spark.implicits._
    val current = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("k", "attr")
    val incoming = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "attr")
    val out = Quality.detectChanges(current, incoming, Seq("k"), Seq("attr"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(out == Map(1L -> "update", 2L -> "no_change"))
  }
}
