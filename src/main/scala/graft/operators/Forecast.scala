package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-group sales forecasting (reference: src/analytics/ml/predictor.py —
  * a per-segment sales forecast fit on historical daily revenue). The
  * reference pulls the series to the driver and fits with sklearn; here the
  * query semantics (fitted linear trend projected `horizonDays` ahead) are
  * a distributed OLS over exact integer moments — the `Stats.trendDetection`
  * recipe (n, Σx, Σy, Σxy, Σx²) extended with the projection step. Two
  * shuffles total (daily rollup, per-country moments); no driver-side
  * series, no MLOps. */
object Forecast {

  /** (country, n_days, slope, intercept, last_day, forecast_day,
    * forecast_revenue): OLS on (epoch-day, daily revenue cents), projected
    * `horizonDays` past each country's last observed day. Groups with fewer
    * than 3 days or a degenerate x-variance forecast NULL. */
  def salesForecast(spark: SparkSession, dir: String, horizonDays: Int = 30): DataFrame = {
    val daily = Tables.ordersWithCountry(spark, dir)
      .select(col("country"), to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("country", "day").agg(sum("cents").as("y"))
      .withColumn("x", datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"))
    def dec(c: String): Column = col(c).cast("decimal(19,0)")
    val m = daily.groupBy("country").agg(
      countAll.as("n_days"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(dec("x") * dec("y")).as("sxy"),
      sum(dec("x") * dec("x")).as("sxx"),
      max(col("x")).as("xmax"), max(col("day")).as("last_day"))
    val nD = col("n_days").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val num = nD * d("sxy") - d("sx") * d("sy")
    val denX = nD * d("sxx") - d("sx") * d("sx")
    val bad = col("n_days") < 3 || denX === 0.0
    // slope/intercept in cents-per-day / cents; forecast at x = xmax + h
    val slopeC = num / denX
    val interceptC = (d("sy") - slopeC * d("sx")) / nD
    val forecastC = interceptC + slopeC * (d("xmax") + lit(horizonDays.toDouble))
    m.select(
      col("country"), col("n_days"),
      when(bad, lit(null).cast("double")).otherwise(slopeC / lit(100.0)).as("slope"),
      when(bad, lit(null).cast("double")).otherwise(interceptC / lit(100.0)).as("intercept"),
      col("last_day"),
      date_add(col("last_day"), horizonDays).as("forecast_day"),
      when(bad, lit(null).cast("double")).otherwise(forecastC / lit(100.0)).as("forecast_revenue"))
  }

  /** DuckDB oracle mirroring salesForecast (horizon 30 days). */
  def salesForecastOracle: String =
    """WITH daily AS (
      |  SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), xy AS (
      |  SELECT country, day, y, CAST(datediff('day', DATE '1992-01-01', day) AS BIGINT) AS x FROM daily
      |), m AS (
      |  SELECT country, COUNT(*) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
      |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
      |    CAST(MAX(x) AS BIGINT) AS xmax, MAX(day) AS last_day
      |  FROM xy GROUP BY 1
      |), p AS (
      |  SELECT country, n_days, last_day,
      |    CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |    CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den_x,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
      |    CAST(xmax AS DOUBLE) AS xmaxd,
      |    n_days < 3 OR (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0 AS bad
      |  FROM m
      |), s AS (
      |  SELECT country, n_days, last_day, bad,
      |    num / den_x AS slope_c,
      |    (syd - (num / den_x) * sxd) / CAST(n_days AS DOUBLE) AS intercept_c,
      |    xmaxd
      |  FROM p
      |)
      |SELECT country, n_days,
      |  CASE WHEN bad THEN NULL ELSE slope_c / 100.0 END AS slope,
      |  CASE WHEN bad THEN NULL ELSE intercept_c / 100.0 END AS intercept,
      |  last_day,
      |  last_day + 30 AS forecast_day,
      |  CASE WHEN bad THEN NULL ELSE (intercept_c + slope_c * (xmaxd + 30.0)) / 100.0 END AS forecast_revenue
      |FROM s""".stripMargin
}
