package graft

import graft.operators.{Stats, TimeSeries}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the time-series structure analysis operators
  * (exact values pinned by the DuckDB crosscheck gate). */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("change points: top-5 strongest, z consistent with flag and window means") {
    val rows = TimeSeries.changePoints(spark, dir).collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    val zs = rows.map(_.getAs[Double]("z_score"))
    assert(zs.forall(_ >= 0.0))
    rows.foreach { r =>
      val recomputed = math.abs(r.getAs[Double]("mean_after") - r.getAs[Double]("mean_before")) /
        ((r.getAs[Double]("std_before") + r.getAs[Double]("std_after")) / 2.0)
      assert(math.abs(recomputed - r.getAs[Double]("z_score")) < 1e-12)
      assert(r.getAs[Boolean]("is_change_point") == (r.getAs[Double]("z_score") > 2.0))
    }
  }

  test("anomalous periods: severity grades follow the z thresholds, end after start") {
    val rows = TimeSeries.anomalousPeriods(spark, dir).collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z_score")
      val sev = r.getAs[String]("severity")
      if (z > 3.0) assert(sev == "high")
      else if (z > 2.5) assert(sev == "medium")
      else assert(sev == "normal")
      assert(!r.getAs[java.sql.Date]("end_time").before(r.getAs[java.sql.Date]("start_time")))
    }
  }

  test("seasonality check: one row per country, deviation non-negative, flag consistent") {
    val rows = TimeSeries.seasonalityCheck(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("country")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("months_observed") >= 1 && r.getAs[Long]("months_observed") <= 12)
      assert(r.getAs[Double]("avg_monthly_deviation") >= 0.0)
      if (r.getAs[Boolean]("is_seasonal")) {
        assert(r.getAs[Long]("n_days") >= 24)
        assert(r.getAs[Double]("avg_monthly_deviation") > r.getAs[Double]("overall_std") * 0.5)
      }
    }
  }

  test("normality: JB is non-negative and the flag is the chi2(2) critical-value decision") {
    val rows = Stats.normalityCheck(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("jb_stat"))) {
        val jb = r.getAs[Double]("jb_stat")
        assert(jb >= 0.0)
        assert(r.getAs[Boolean]("is_normal") == (jb < 5.991464547107979))
      }
    }
  }
}
