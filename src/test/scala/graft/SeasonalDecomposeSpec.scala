package graft

import graft.operators.{EtsForecast, SeasonalDecompose}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeasonalDecomposeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("full calendar coverage; trend NULL exactly in the 6-month edge bands") {
    val out = SeasonalDecompose.seasonalDecompose(spark, dir).persist()
    val nNations = Tables.nation(spark, dir).count()
    val months = out.select("ym").distinct().count()
    assert(out.count() == nNations * months)
    // per nation: exactly 12 trend-NULL rows (6 leading + 6 trailing)
    val nulls = out.groupBy("n_name")
      .agg(sum(when(col("trend_scaled").isNull, 1L).otherwise(0L)).as("nn"))
    assert(nulls.filter(col("nn") =!= 12L).count() == 0)
    // residual defined iff trend defined
    assert(out.filter(col("trend_scaled").isNull =!= col("resid_scaled").isNull)
      .count() == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("additive identity: observed*S = trend + seasonal + resid on defined rows") {
    val s = EtsForecast.Scale
    val out = SeasonalDecompose.seasonalDecompose(spark, dir)
      .filter(col("trend_scaled").isNotNull)
      .withColumn("recon",
        col("trend_scaled") + col("seasonal_scaled") + col("resid_scaled"))
    assert(out.filter(col("recon") =!= col("observed_cents") * lit(s)).count() == 0,
      "decomposition must reconstruct the observed series exactly")
    spark.catalog.clearCache()
  }

  test("seasonal is 12-periodic and near-centered per nation") {
    val out = SeasonalDecompose.seasonalDecompose(spark, dir).persist()
    // 12-periodic: per (nation, ym mod 12 of the series POSITION) one value.
    // positions are (ym - min ym); recompute per nation
    val lo = out.agg(min("ym")).head.getLong(0)
    val per = out.withColumn("slot", (col("ym") - lit(lo)) % 12)
      .groupBy("n_name", "slot")
      .agg(countDistinct(col("seasonal_scaled")).as("d"))
    assert(per.filter(col("d") =!= 1L).count() == 0)
    // centered: the 12 slot values sum to ~0 (|sum| < 12 by truncation)
    val sums = out.withColumn("slot", (col("ym") - lit(lo)) % 12)
      .groupBy("n_name", "slot").agg(first("seasonal_scaled").as("v"))
      .groupBy("n_name").agg(sum("v").as("sv"))
    assert(sums.filter(abs(col("sv")) >= 12L).count() == 0,
      "slot means minus their mean must sum to ~0 (truncation slack < 12)")
    out.unpersist()
    spark.catalog.clearCache()
  }
}
