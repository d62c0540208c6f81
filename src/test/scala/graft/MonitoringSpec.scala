package graft

import graft.operators.Monitoring
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for quality trends and subject erasure. */
class MonitoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("quality trends: three metric series, direction matches the half averages") {
    val rows = Monitoring.qualityTrends(spark, dir).collect()
    assert(rows.map(_.getAs[String]("metric_name")).sorted.toSeq ==
      Seq("daily_high_value_orders", "daily_revenue", "daily_volume"))
    rows.foreach { r =>
      val f = r.getAs[Double]("first_half_avg")
      val s = r.getAs[Double]("second_half_avg")
      val dir0 = r.getAs[String]("direction")
      if (math.abs(s - f) < 0.01) assert(dir0 == "stable")
      else if (s > f) assert(dir0 == "improving") else assert(dir0 == "declining")
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("avg_value"))
      assert(r.getAs[Double]("avg_value") <= r.getAs[Double]("max_value"))
      assert(r.getAs[Long]("data_points") >= 2)
    }
  }

  test("subject erasure: cascade is complete — no subject data survives in any table") {
    val report = Monitoring.subjectErasure(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_before"), r.getAs[Long]("rows_purged"), r.getAs[Long]("rows_after"))).toMap
    assert(report.keySet == Set("customer", "orders", "lineitem"))
    report.values.foreach { case (before, purged, after) =>
      assert(before == purged + after)
      assert(purged > 0, "synthetic subject set should be non-empty")
    }
    // the purged frames really drop the subjects
    val subjects = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val purged = Monitoring.erase(Tables.orders(spark, dir), "o_custkey",
      subjects.withColumnRenamed("c_custkey", "k"))
    assert(purged.join(subjects, purged("o_custkey") === subjects("c_custkey")).count() == 0)
  }
}
