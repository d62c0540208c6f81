package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Autoregressive AR(2) revenue forecast per nation — the ARIMA-class
  * surface of the reference's predictive engine
  * (`/root/reference/src/ml/analytics/predictive_engine.py:24,222,314` —
  * statsmodels/pmdarima `auto_arima`). Auto parameter search and MLE
  * innovations fits are irreproducible outside those libraries; this
  * ships the PINNED-math sibling the r16 verdict asked for: exact
  * least-squares AR(p = 2, d = 0) with intercept over the lagged monthly
  * series (`y_t = c + φ1·y_{t−1} + φ2·y_{t−2}`), solved by Cramer's rule,
  * projected a pinned 6-month horizon.
  *
  * Determinism contract (the `sales_forecast` OLS recipe, one order up):
  *  - all nine normal-equation moments (n, Σy1, Σy2, Σy1², Σy2², Σy1y2,
  *    Σy, Σyy1, Σyy2) are EXACT integers, each < 2^53 so the int→double
  *    boundary is lossless on both engines. That bound is engineered by a
  *    REPLICATED power-of-10 pre-scale: g = max(0, digits(max monthly
  *    cents) − 6), series = cents // 10^g — truncating division of
  *    non-negative integers, bit-identical in Spark (`div`) and DuckDB
  *    (`//`). At 100 TB the series just carries a larger g; the moments
  *    never leave the exact window.
  *  - everything after the cast is pure binary64 with textually identical
  *    association on both engines (3×3 cofactor expansions, then the
  *    6-step forecast recurrence unrolled in a fixed order), so results
  *    are bit-exact — doubles compare by hash, no tolerance.
  *
  * Scale shape: one corpus-sized shuffle (the monthly groupBy inside
  * [[EtsForecast.monthlySeries]]); the lag window and the moment groupBy
  * run over the calendar-bounded series (nations × ~84 months at ANY
  * corpus size). Degenerate fits (n < 3 or a singular normal matrix)
  * forecast NULL, like `sales_forecast`.
  *
  * Prophet (`predictive_engine.py:27`) is the one reference forecaster
  * with NO replayable sibling — a changepoint GAM fit by L-BFGS/MCMC over
  * Stan; its output is not expressible as deterministic relational
  * arithmetic. Documented as a boundary in SURVEY §6 rather than faked. */
object ArForecast {

  val Horizon = 6

  /** (n_name, horizon, phi1, phi2, intercept, forecast_scaled, scale_pow):
    * six forecast months per nation in `10^scale_pow`-cent units. */
  def arForecast(spark: SparkSession, dir: String): DataFrame = {
    val ser = EtsForecast.monthlySeries(spark, dir).toDF("n_name", "ym", "cents")

    // replicated pre-scale: keep every moment < 2^53 (see object doc)
    val gmaxRow = ser.agg(max("cents")).head
    val gmax = if (gmaxRow.isNullAt(0)) 0L else math.max(0L, gmaxRow.getLong(0))
    val g = math.max(0, gmax.toString.length - 6)
    val scalePow = BigInt(10).pow(g).toLong

    val w = Window.partitionBy("n_name").orderBy("ym")
    val lagged = ser
      .withColumn("ys", expr(s"cents div ${scalePow}L"))
      .withColumn("y1", lag(col("ys"), 1).over(w))
      .withColumn("y2", lag(col("ys"), 2).over(w))
      .filter(col("y2").isNotNull)

    val m = lagged.groupBy("n_name").agg(
      graft.Exact.countAll.as("n"),
      sum("y1").as("s1"), sum("y2").as("s2"),
      sum(col("y1") * col("y1")).as("s11"),
      sum(col("y2") * col("y2")).as("s22"),
      sum(col("y1") * col("y2")).as("s12"),
      sum("ys").as("sy"),
      sum(col("ys") * col("y1")).as("sy1"),
      sum(col("ys") * col("y2")).as("sy2"),
      max_by(col("ys"), col("ym")).as("yt"),
      max_by(col("y1"), col("ym")).as("yt1"))

    def d(c: String): Column = col(c).cast("double")
    val (n, s1, s2, s11, s22, s12, sy, sy1, sy2) =
      (d("n"), d("s1"), d("s2"), d("s11"), d("s22"), d("s12"),
        d("sy"), d("sy1"), d("sy2"))
    // 3x3 cofactor expansions — textually identical in the oracle
    val detA = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val detC = sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)
    val detP1 = n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    val detP2 = n * (s11 * sy2 - sy1 * s12) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)
    val bad = col("n") < 3 || detA === 0.0
    // ANSI mode throws DIVIDE_BY_ZERO even for doubles; the singular case
    // is masked to NULL by `bad` downstream, so a dummy divisor of 1.0 on
    // that branch changes nothing the gate can see
    val safeDet = when(detA === 0.0, lit(1.0)).otherwise(detA)

    val solved = m.select(col("n_name"), bad.as("bad"),
      (detC / safeDet).as("c"), (detP1 / safeDet).as("p1"),
      (detP2 / safeDet).as("p2"),
      d("yt").as("ytd"), d("yt1").as("yt1d"))

    // 6-step recurrence, unrolled in a pinned order (left-assoc
    // c + p1*prev1 + p2*prev2 on both engines)
    val f1 = col("c") + col("p1") * col("ytd") + col("p2") * col("yt1d")
    val withF = solved.withColumn("f1", f1)
      .withColumn("f2", col("c") + col("p1") * col("f1") + col("p2") * col("ytd"))
      .withColumn("f3", col("c") + col("p1") * col("f2") + col("p2") * col("f1"))
      .withColumn("f4", col("c") + col("p1") * col("f3") + col("p2") * col("f2"))
      .withColumn("f5", col("c") + col("p1") * col("f4") + col("p2") * col("f3"))
      .withColumn("f6", col("c") + col("p1") * col("f5") + col("p2") * col("f4"))

    def guarded(c: Column): Column =
      when(col("bad"), lit(null).cast("double")).otherwise(c)
    withF
      .select(col("n_name"), col("bad"), col("c"), col("p1"), col("p2"),
        posexplode(array((1 to Horizon).map(h => col(s"f$h")): _*)))
      .select(col("n_name"),
        (col("pos") + 1).cast("long").as("horizon"),
        guarded(col("p1")).as("phi1"),
        guarded(col("p2")).as("phi2"),
        guarded(col("c")).as("intercept"),
        guarded(col("col")).as("forecast_scaled"),
        lit(g.toLong).as("scale_pow"))
      .orderBy("n_name", "horizon")
  }

  /** DuckDB replay: identical pre-scale, identical moment set (all-BIGINT
    * exact), identical double formulas (same textual association), 6-step
    * recurrence as chained expressions, horizons via a VALUES cross join. */
  def arForecastOracle(): String = {
    s"""WITH mo AS MATERIALIZED (
       |  SELECT n_name, year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym,
       |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2
       |), bounds AS (SELECT MIN(ym) AS lo, MAX(ym) AS hi FROM mo),
       |ser AS MATERIALIZED (
       |  SELECT n.n_name, c.ym, COALESCE(mo.cents, 0) AS cents
       |  FROM nation n
       |  CROSS JOIN (SELECT unnest(range((SELECT lo FROM bounds),
       |                                  (SELECT hi FROM bounds) + 1)) AS ym) c
       |  LEFT JOIN mo ON mo.n_name = n.n_name AND mo.ym = c.ym
       |), sc AS (
       |  SELECT CAST(power(10, GREATEST(0,
       |    LENGTH(CAST(GREATEST(MAX(cents), 0) AS VARCHAR)) - 6)) AS BIGINT) AS s,
       |    GREATEST(0,
       |      LENGTH(CAST(GREATEST(MAX(cents), 0) AS VARCHAR)) - 6) AS g
       |  FROM ser
       |), lagged AS MATERIALIZED (
       |  SELECT n_name, ym, ys,
       |    lag(ys, 1) OVER (PARTITION BY n_name ORDER BY ym) AS y1,
       |    lag(ys, 2) OVER (PARTITION BY n_name ORDER BY ym) AS y2
       |  FROM (SELECT n_name, ym, cents // (SELECT s FROM sc) AS ys FROM ser)
       |), m AS MATERIALIZED (
       |  SELECT n_name, COUNT(*) AS n,
       |    SUM(y1) AS s1, SUM(y2) AS s2,
       |    SUM(y1 * y1) AS s11, SUM(y2 * y2) AS s22, SUM(y1 * y2) AS s12,
       |    SUM(ys) AS sy, SUM(ys * y1) AS sy1, SUM(ys * y2) AS sy2,
       |    max_by(ys, ym) AS yt, max_by(y1, ym) AS yt1
       |  FROM lagged WHERE y2 IS NOT NULL GROUP BY 1
       |), p AS (
       |  SELECT n_name, n,
       |    CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
       |    CAST(s2 AS DOUBLE) AS s2d, CAST(s11 AS DOUBLE) AS s11d,
       |    CAST(s22 AS DOUBLE) AS s22d, CAST(s12 AS DOUBLE) AS s12d,
       |    CAST(sy AS DOUBLE) AS syd, CAST(sy1 AS DOUBLE) AS sy1d,
       |    CAST(sy2 AS DOUBLE) AS sy2d,
       |    CAST(yt AS DOUBLE) AS ytd, CAST(yt1 AS DOUBLE) AS yt1d
       |  FROM m
       |), dets AS (
       |  SELECT n_name, n, ytd, yt1d,
       |    nd * (s11d * s22d - s12d * s12d) - s1d * (s1d * s22d - s12d * s2d) + s2d * (s1d * s12d - s11d * s2d) AS det_a,
       |    syd * (s11d * s22d - s12d * s12d) - s1d * (sy1d * s22d - s12d * sy2d) + s2d * (sy1d * s12d - s11d * sy2d) AS det_c,
       |    nd * (sy1d * s22d - s12d * sy2d) - syd * (s1d * s22d - s12d * s2d) + s2d * (s1d * sy2d - sy1d * s2d) AS det_p1,
       |    nd * (s11d * sy2d - sy1d * s12d) - s1d * (s1d * sy2d - sy1d * s2d) + syd * (s1d * s12d - s11d * s2d) AS det_p2
       |  FROM p
       |), solved AS (
       |  SELECT n_name, (n < 3 OR det_a = 0.0) AS bad,
       |    det_c / det_a AS c, det_p1 / det_a AS p1, det_p2 / det_a AS p2,
       |    ytd, yt1d
       |  FROM dets
       |), r1 AS (SELECT *, c + p1 * ytd + p2 * yt1d AS f1 FROM solved),
       |r2 AS (SELECT *, c + p1 * f1 + p2 * ytd AS f2 FROM r1),
       |r3 AS (SELECT *, c + p1 * f2 + p2 * f1 AS f3 FROM r2),
       |r4 AS (SELECT *, c + p1 * f3 + p2 * f2 AS f4 FROM r3),
       |r5 AS (SELECT *, c + p1 * f4 + p2 * f3 AS f5 FROM r4),
       |r6 AS (SELECT *, c + p1 * f5 + p2 * f4 AS f6 FROM r5)
       |SELECT n_name, CAST(h AS BIGINT) AS horizon,
       |  CASE WHEN bad THEN NULL ELSE p1 END AS phi1,
       |  CASE WHEN bad THEN NULL ELSE p2 END AS phi2,
       |  CASE WHEN bad THEN NULL ELSE c END AS intercept,
       |  CASE WHEN bad THEN NULL
       |       ELSE CASE h WHEN 1 THEN f1 WHEN 2 THEN f2 WHEN 3 THEN f3
       |                   WHEN 4 THEN f4 WHEN 5 THEN f5 ELSE f6 END
       |  END AS forecast_scaled,
       |  (SELECT CAST(g AS BIGINT) FROM sc) AS scale_pow
       |FROM r6 CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6)) AS hz(h)
       |ORDER BY n_name, horizon""".stripMargin
  }
}
