package graft

import graft.operators.EtsForecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EtsForecastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every nation gets 6 horizons; level/trend constant per nation") {
    val out = EtsForecast.etsForecast(spark, dir).persist()
    val nNations = Tables.nation(spark, dir).count()
    assert(out.count() == nNations * EtsForecast.Horizon)
    val per = out.groupBy("n_name").agg(
      count(lit(1)).as("n"),
      countDistinct(col("level_scaled")).as("dl"),
      countDistinct(col("trend_scaled")).as("dt"))
    assert(per.filter(col("n") =!= EtsForecast.Horizon).count() == 0)
    assert(per.filter(col("dl") =!= 1 || col("dt") =!= 1).count() == 0,
      "final level/trend must be one value per fitted series")
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("forecast decomposes exactly: f_h - h*b - l is a seasonal slot, 12-periodic") {
    // f_h = l + h*b + s_slot by construction; the seasonal residue for
    // horizons h and h+12 would be equal — with Horizon=6 we can at least
    // assert the residue is EXACTLY f_h - h*b - l (integer identity) and
    // bounded by the seasonal magnitude (|s| <= max |y*S - A1*S| scale).
    val out = EtsForecast.etsForecast(spark, dir)
      .withColumn("resid",
        col("forecast_scaled") - col("horizon") * col("trend_scaled") - col("level_scaled"))
    // residues are exact integers already; sanity: not all zero (a real
    // seasonal component exists for at least one nation at every SF)
    assert(out.filter(col("resid") =!= 0L).count() > 0)
    spark.catalog.clearCache()
  }

  test("incremental warm continuation is bit-identical to the cold fit") {
    val cold = EtsForecast.etsForecast(spark, dir)
    val warm = EtsForecast.etsIncremental(spark, dir)
    assert(cold.exceptAll(warm).count() == 0 && warm.exceptAll(cold).count() == 0,
      "settled-state + delta-months continuation must replay the cold recurrence exactly")
    spark.catalog.clearCache()
  }

  test("a planted linear series forecasts its own continuation (no seasonality)") {
    // y_t = 1000 + 10t cents over 36 months, one synthetic nation: level
    // tracks the line, trend -> ~10*Scale/... after smoothing; forecast
    // must keep increasing by a near-constant step = trend.
    // Build via a tmp dir with planted orders/customer/nation parquet.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ets_plant").toString
    (0 until 36).map { t =>
      // one order per month, amount 10.00 + 0.10*t dollars
      (t.toLong, java.sql.Date.valueOf(f"${1992 + t / 12}%04d-${t % 12 + 1}%02d-15"),
        10.0 + 0.10 * t, 1L)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, "PLANTED")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    val out = EtsForecast.etsForecast(spark, tmp)
      .orderBy("horizon").collect()
    assert(out.length == EtsForecast.Horizon)
    val trend = out.head.getAs[Long]("trend_scaled")
    // the true slope is 10 cents/month = 10*Scale in micro-cents; smoothing
    // on an exact line converges near it
    assert(math.abs(trend - 10L * EtsForecast.Scale) <= 2L * EtsForecast.Scale,
      s"trend $trend far from ${10L * EtsForecast.Scale}")
    // successive horizons differ by trend + seasonal-slot delta; on a pure
    // line the seasonal slots are small, so forecasts must be increasing
    val fs = out.map(_.getAs[Long]("forecast_scaled"))
    assert(fs.zip(fs.tail).forall { case (a, b) => b > a },
      s"forecasts not increasing: ${fs.mkString(",")}")
    spark.catalog.clearCache()
  }
}
