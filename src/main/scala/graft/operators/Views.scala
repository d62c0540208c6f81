package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining gold materialized-view suite (reference:
  * src/etl/gold/materialized_views_manager.py — operational KPIs `:263`,
  * financial KPIs `:490`, daily sales KPI `:801`, anomaly-detection KPIs
  * `:921`), re-expressed over the graft tables.
  *
  * Shared scale shapes: every view is one keyed rollup (single shuffle on
  * the bucket key) followed by windows over the AGGREGATED frame, whose row
  * count is calendar-bounded (hours/days/months — constant in data size),
  * so the unpartitioned trend windows never become the bottleneck.
  * Percentiles are exact discrete order statistics in integer centi-units
  * (the reference's PERCENTILE_CONT interpolates — not engine-portable,
  * SURVEY §3); rolling stddev comes from exact rolling decimal sums of v
  * and v², so moments are bit-identical across engines.
  */
object Views {

  // ---------------------------------------------------------------- helpers

  private def centsL(c: Column): Column = round(c * 100, 0).cast("long")

  /** Sample stddev from exact rolling sums: sqrt((n·s2 − s1²)/(n·(n−1))).
    * s2 (the Σv² DECIMAL(38,0)) passes 2^63 once a window holds ~30 days of
    * squared daily cent sums (measured at sf0.1: daily_sales_kpi's q30 hit
    * 3e19) — the direct decimal→double cast is not engine-portable there, so
    * it rides the 2^62 hi/lo split (Exact.bigDecToDouble, the r9 overflow
    * lesson). s1 is a plain cent sum, orders of magnitude under 2^53. */
  private def rollStd(n: Column, s1: Column, s2: Column): Column = {
    val nD = n.cast("double")
    when(n <= 1, lit(null).cast("double"))
      .otherwise(sqrt((nD * graft.Exact.bigDecToDouble(s2.cast("decimal(38,0)"))
        - s1.cast("double") * s1.cast("double"))
        / (nD * (nD - lit(1.0)))))
  }

  // ----------------------------------------------------- operational KPIs

  /** Operational KPIs per hour over the event stream (reference `:263` —
    * processing volume, error/success rates, latency profile with exact
    * p95/p99, performance grade ladder). `value` plays the reference's
    * processing_time role; `event_type = 'error'` its failure status. */
  def operationalKpis(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH").as("bucket"),
      col("event_type"),
      centsL(col("value")).as("centi"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("centi"), col("event_id"))
    val ranked = e
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("bucket"))).cast("long"))
    val agg = ranked.groupBy(col("bucket"), col("n").as("total_events"))
      .agg(
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).cast("long").as("error_events"),
        sum(col("centi").cast("decimal(19,0)")).as("__s"),
        min("centi").as("__mn"), max("centi").as("__mx"),
        min(when(col("rn") === ceil(col("n") * 0.95), col("centi"))).as("__p95"),
        min(when(col("rn") === ceil(col("n") * 0.99), col("centi"))).as("__p99"))
    val total = col("total_events").cast("double")
    agg.select(
      col("bucket"), col("total_events"), col("error_events"),
      (col("total_events") - col("error_events")).cast("long").as("success_events"),
      ((col("total_events") - col("error_events")).cast("double") / total * lit(100.0)).as("success_rate_pct"),
      (col("error_events").cast("double") / total * lit(100.0)).as("error_rate_pct"),
      (col("__s").cast("double") / lit(100.0) / total).as("avg_value"),
      (col("__mn").cast("double") / 100.0).as("min_value"),
      (col("__mx").cast("double") / 100.0).as("max_value"),
      (col("__p95").cast("double") / 100.0).as("p95_value"),
      (col("__p99").cast("double") / 100.0).as("p99_value"),
      when(col("__p95") < 1500L, "excellent")
        .when(col("__p95") < 1800L, "good")
        .when(col("__p95") < 1900L, "fair")
        .otherwise("needs_improvement").as("performance_grade"))
  }

  def operationalKpisOracle: String =
    """WITH e AS (
      |  SELECT event_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
      |    event_type, CAST(round(value * 100) AS BIGINT) AS centi
      |  FROM events
      |), ranked AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY centi, event_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n
      |  FROM e
      |), agg AS (
      |  SELECT bucket, n AS total_events,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
      |    SUM(CAST(centi AS DECIMAL(19,0))) AS s,
      |    MIN(centi) AS mn, MAX(centi) AS mx,
      |    MIN(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN centi END) AS p95,
      |    MIN(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN centi END) AS p99
      |  FROM ranked GROUP BY 1, 2
      |)
      |SELECT bucket, total_events, error_events,
      |  CAST(total_events - error_events AS BIGINT) AS success_events,
      |  CAST(total_events - error_events AS DOUBLE) / CAST(total_events AS DOUBLE) * 100.0 AS success_rate_pct,
      |  CAST(error_events AS DOUBLE) / CAST(total_events AS DOUBLE) * 100.0 AS error_rate_pct,
      |  CAST(s AS DOUBLE) / 100.0 / CAST(total_events AS DOUBLE) AS avg_value,
      |  CAST(mn AS DOUBLE) / 100.0 AS min_value,
      |  CAST(mx AS DOUBLE) / 100.0 AS max_value,
      |  CAST(p95 AS DOUBLE) / 100.0 AS p95_value,
      |  CAST(p99 AS DOUBLE) / 100.0 AS p99_value,
      |  CASE WHEN p95 < 1500 THEN 'excellent'
      |       WHEN p95 < 1800 THEN 'good'
      |       WHEN p95 < 1900 THEN 'fair'
      |       ELSE 'needs_improvement' END AS performance_grade
      |FROM agg""".stripMargin

  /** Real-time sales metrics per hour (reference `:325`
    * `_get_realtime_sales_metrics_query` — hourly volume/revenue/avg/
    * distinct buyers/min/max, exact-sum stddev, and the count of sales above
    * 2× the GLOBAL average). The global-average comparison is a broadcast
    * one-row aggregate joined into the bucket rollup — the reference's
    * correlated subquery without re-scanning per row. */
  def realtimeMetrics(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      date_format(col("ts"), "yyyy-MM-dd HH").as("bucket"),
      col("user_id"), centsL(col("value")).as("centi"))
    val globalAvg = broadcast(e.agg(
      sum(col("centi").cast("decimal(19,0)")).as("__gs"), countAll.as("__gn")))
    val agg = e.groupBy("bucket").agg(
      countAll.as("n_events"),
      countDistinct(col("user_id")).as("unique_users"),
      sum(col("centi").cast("decimal(19,0)")).as("__s"),
      sum((col("centi").cast("decimal(19,0)") * col("centi").cast("decimal(19,0)")).cast("decimal(38,0)")).as("__q"),
      min("centi").as("__mn"), max("centi").as("__mx"))
    // the outlier count needs the global scalar inside an aggregate — a
    // second conditional rollup after the broadcast join (one extra pass
    // over the hour-partitioned frame, never a per-row subquery)
    val n = col("n_events").cast("double")
    agg
      .crossJoin(globalAvg)
      .join(
        e.crossJoin(globalAvg)
          .filter(col("centi").cast("double") > col("__gs").cast("double") / col("__gn").cast("double") * 2.0)
          .groupBy("bucket").agg(countAll.as("outlier_sales")),
        Seq("bucket"), "left")
      .select(
        col("bucket"), col("n_events"), col("unique_users"),
        (col("__s").cast("double") / 100.0).as("total_revenue"),
        (col("__s").cast("double") / 100.0 / n).as("avg_sale"),
        (col("__mn").cast("double") / 100.0).as("min_sale"),
        (col("__mx").cast("double") / 100.0).as("max_sale"),
        (rollStd(col("n_events"), col("__s"), col("__q")) / 100.0).as("revenue_stddev"),
        coalesce(col("outlier_sales"), lit(0L)).cast("long").as("outlier_sales"))
  }

  def realtimeMetricsOracle: String =
    s"""WITH e AS (
      |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
      |    user_id, CAST(round(value * 100) AS BIGINT) AS centi
      |  FROM events
      |), g AS (
      |  SELECT SUM(CAST(centi AS DECIMAL(19,0))) AS gs, COUNT(*) AS gn FROM e
      |), agg AS (
      |  SELECT bucket, COUNT(*) AS n_events,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
      |    SUM(CAST(centi AS DECIMAL(19,0))) AS s,
      |    SUM(CAST(CAST(centi AS DECIMAL(19,0)) * CAST(centi AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS q,
      |    MIN(centi) AS mn, MAX(centi) AS mx
      |  FROM e GROUP BY 1
      |), outl AS (
      |  SELECT bucket, COUNT(*) AS outlier_sales
      |  FROM e CROSS JOIN g
      |  WHERE CAST(centi AS DOUBLE) > CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE) * 2.0
      |  GROUP BY 1
      |)
      |SELECT agg.bucket, n_events, unique_users,
      |  CAST(s AS DOUBLE) / 100.0 AS total_revenue,
      |  CAST(s AS DOUBLE) / 100.0 / CAST(n_events AS DOUBLE) AS avg_sale,
      |  CAST(mn AS DOUBLE) / 100.0 AS min_sale,
      |  CAST(mx AS DOUBLE) / 100.0 AS max_sale,
      |  CASE WHEN n_events <= 1 THEN NULL
      |       ELSE sqrt((CAST(n_events AS DOUBLE) * ${graft.Exact.bigDecToDoubleSql("q")} - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |                 / (CAST(n_events AS DOUBLE) * (CAST(n_events AS DOUBLE) - 1.0))) / 100.0 END AS revenue_stddev,
      |  CAST(coalesce(outlier_sales, 0) AS BIGINT) AS outlier_sales
      |FROM agg LEFT JOIN outl ON agg.bucket = outl.bucket""".stripMargin

  // ------------------------------------------------------- financial KPIs

  /** Financial KPIs per month (reference `:490` — a revenue stream FULL
    * OUTER JOINed with a cost stream on the time bucket, profit + margin,
    * revenue per customer, month-over-month growth). Revenue = orders;
    * cost stream = lineitem tax amounts bucketed by ship month (ship months
    * extend past order months, so both outer-join sides are exercised). */
  def financialKpis(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("bucket"),
        col("o_custkey"), centsL(col("o_totalprice")).as("cents"))
      .groupBy("bucket")
      .agg(sum(col("cents").cast("decimal(19,0)")).as("__rev"),
        countAll.as("txn_count"),
        countDistinct(col("o_custkey")).as("unique_customers"))
    val cost = Tables.lineitem(spark, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("bucket"),
        round(col("l_extendedprice") * col("l_tax") * 100, 0).cast("long").as("tax_cents"))
      .groupBy("bucket")
      .agg(sum(col("tax_cents").cast("decimal(19,0)")).as("__cost"),
        countAll.as("cost_lines"))
    val j = rev.join(cost, Seq("bucket"), "full_outer")
    val revD = coalesce(col("__rev").cast("double"), lit(0.0)) / lit(100.0)
    val costD = coalesce(col("__cost").cast("double"), lit(0.0)) / lit(100.0)
    val k = j.select(
      col("bucket"),
      revD.as("revenue_total"), costD.as("cost_total"),
      (revD - costD).as("profit_total"),
      when(col("__cost").isNull || col("__cost") <= 0, lit(null).cast("double"))
        .otherwise((revD - costD) / costD * lit(100.0)).as("profit_margin_pct"),
      coalesce(col("txn_count"), lit(0L)).cast("long").as("txn_count"),
      coalesce(col("unique_customers"), lit(0L)).cast("long").as("unique_customers"),
      coalesce(col("cost_lines"), lit(0L)).cast("long").as("cost_lines"),
      when(coalesce(col("unique_customers"), lit(0L)) === 0, lit(null).cast("double"))
        .otherwise(revD / col("unique_customers").cast("double")).as("revenue_per_customer"))
    val wb = Window.orderBy(col("bucket"))
    k.withColumn("__prev", RankOps.boundedFrame("financial_kpis_buckets",
        lag(col("revenue_total"), 1).over(wb)))
      .withColumn("mom_growth_pct",
        when(col("__prev").isNull || col("__prev") === 0.0, lit(null).cast("double"))
          .otherwise((col("revenue_total") - col("__prev")) / col("__prev") * lit(100.0)))
      .drop("__prev")
  }

  def financialKpisOracle: String =
    """WITH rev AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS bucket,
      |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0))) AS rev,
      |    COUNT(*) AS txn_count,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers
      |  FROM orders GROUP BY 1
      |), cost AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS bucket,
      |    SUM(CAST(CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) AS DECIMAL(19,0))) AS cost,
      |    COUNT(*) AS cost_lines
      |  FROM lineitem GROUP BY 1
      |), j AS (
      |  SELECT coalesce(rev.bucket, cost.bucket) AS bucket, rev.rev, cost.cost,
      |    rev.txn_count, rev.unique_customers, cost.cost_lines
      |  FROM rev FULL OUTER JOIN cost ON rev.bucket = cost.bucket
      |), k AS (
      |  SELECT bucket,
      |    coalesce(CAST(rev AS DOUBLE), 0.0) / 100.0 AS revenue_total,
      |    coalesce(CAST(cost AS DOUBLE), 0.0) / 100.0 AS cost_total,
      |    coalesce(CAST(rev AS DOUBLE), 0.0) / 100.0 - coalesce(CAST(cost AS DOUBLE), 0.0) / 100.0 AS profit_total,
      |    CASE WHEN coalesce(cost, 0) <= 0 THEN NULL
      |         ELSE (coalesce(CAST(rev AS DOUBLE), 0.0) / 100.0 - coalesce(CAST(cost AS DOUBLE), 0.0) / 100.0)
      |              / (coalesce(CAST(cost AS DOUBLE), 0.0) / 100.0) * 100.0
      |    END AS profit_margin_pct,
      |    CAST(coalesce(txn_count, 0) AS BIGINT) AS txn_count,
      |    CAST(coalesce(unique_customers, 0) AS BIGINT) AS unique_customers,
      |    CAST(coalesce(cost_lines, 0) AS BIGINT) AS cost_lines,
      |    CASE WHEN coalesce(unique_customers, 0) = 0 THEN NULL
      |         ELSE coalesce(CAST(rev AS DOUBLE), 0.0) / 100.0 / CAST(unique_customers AS DOUBLE)
      |    END AS revenue_per_customer
      |  FROM j
      |)
      |SELECT *,
      |  CASE WHEN LAG(revenue_total) OVER (ORDER BY bucket) IS NULL
      |         OR LAG(revenue_total) OVER (ORDER BY bucket) = 0.0 THEN NULL
      |       ELSE (revenue_total - LAG(revenue_total) OVER (ORDER BY bucket))
      |            / LAG(revenue_total) OVER (ORDER BY bucket) * 100.0
      |  END AS mom_growth_pct
      |FROM k""".stripMargin

  // ------------------------------------------------------ daily sales KPI

  /** Daily sales KPI with trend + anomaly flags (reference `:801` — daily
    * rollup, 7-day moving average, day-over-day and week-over-week growth,
    * rolling 30-day stddev, volatility/performance/anomaly classification,
    * exact median and p90 line value). */
  def dailySalesKpi(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.salesFact(spark, dir).select(
      to_date(col("o_orderdate")).as("day"),
      col("o_custkey"), col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long").as("qty"),
      centsL(col("l_extendedprice")).as("gross_c"),
      centsL(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_c"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("net_c"), col("l_orderkey"), col("l_linenumber"))
    val ranked = f
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("day"))).cast("long"))
    val daily = ranked.groupBy(col("day"), col("n").as("n_lines"))
      .agg(
        sum("qty").cast("long").as("total_qty"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        sum(col("gross_c").cast("decimal(19,0)")).as("__g"),
        sum(col("net_c").cast("decimal(19,0)")).as("__nt"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("net_c"))).as("__med"),
        min(when(col("rn") === ceil(col("n") * 0.9), col("net_c"))).as("__p90"))
      .withColumn("net_cents", col("__nt").cast("decimal(19,0)"))
      .withColumn("fiscal_year", year(col("day")).cast("long"))
      .withColumn("fiscal_quarter", quarter(col("day")).cast("long"))
    val wd = Window.orderBy(col("day"))
    val w7 = wd.rowsBetween(-6, 0)
    val w30 = wd.rowsBetween(-29, 0)
    val netD = col("net_cents").cast("double")
    val trended = daily
      .withColumn("__prev", RankOps.boundedFrame("daily_sales_kpi",
        lag(col("net_cents"), 1).over(wd)))
      .withColumn("__lw", lag(col("net_cents"), 7).over(wd))
      .withColumn("__s7", sum(col("net_cents")).over(w7))
      .withColumn("__c7", count(lit(1)).over(w7).cast("long"))
      .withColumn("__s30", sum(col("net_cents")).over(w30))
      .withColumn("__q30", sum((col("net_cents") * col("net_cents")).cast("decimal(38,0)")).over(w30))
      .withColumn("__c30", count(lit(1)).over(w30).cast("long"))
    val avg7 = col("__s7").cast("double") / col("__c7").cast("double")
    val std30 = rollStd(col("__c30"), col("__s30"), col("__q30"))
    val growth = when(col("__prev").isNull || col("__prev") === 0, lit(null).cast("double"))
      .otherwise((netD - col("__prev").cast("double")) / col("__prev").cast("double") * lit(100.0))
    val wow = when(col("__lw").isNull || col("__lw") === 0, lit(null).cast("double"))
      .otherwise((netD - col("__lw").cast("double")) / col("__lw").cast("double") * lit(100.0))
    trended.select(
      col("day"), col("fiscal_year"), col("fiscal_quarter"), col("n_lines"),
      col("total_qty"), col("unique_customers"),
      (col("__g").cast("double") / 100.0).as("gross_revenue"),
      (netD / 100.0).as("net_revenue"),
      (netD / 100.0 / col("n_lines").cast("double")).as("avg_line_value"),
      (col("__med").cast("double") / 100.0).as("median_line_value"),
      (col("__p90").cast("double") / 100.0).as("p90_line_value"),
      (col("__prev").cast("double") / 100.0).as("prev_day_revenue"),
      (col("__lw").cast("double") / 100.0).as("same_day_last_week"),
      (avg7 / 100.0).as("seven_day_avg_revenue"),
      growth.as("daily_growth_pct"),
      wow.as("wow_growth_pct"),
      (std30 / 100.0).as("rolling_30d_stddev"),
      when(abs(growth) > 25.0, "HIGH_VOLATILITY")
        .when(abs(growth) > 10.0, "MODERATE_VOLATILITY")
        .otherwise("STABLE").as("volatility_flag"),
      when(netD < avg7 * 0.8, "UNDERPERFORMING")
        .when(netD > avg7 * 1.2, "OVERPERFORMING")
        .otherwise("NORMAL").as("performance_flag"),
      coalesce(std30 > 0.0 && abs(netD - avg7) > std30 * 2.0, lit(false)).as("is_anomaly"))
  }

  def dailySalesKpiOracle: String =
    s"""WITH f AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, o_custkey, l_orderkey, l_linenumber,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS gross_c,
      |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), ranked AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY net_c, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY day) AS BIGINT) AS n
      |  FROM f
      |), daily AS (
      |  SELECT day, n AS n_lines,
      |    CAST(year(day) AS BIGINT) AS fiscal_year,
      |    CAST(quarter(day) AS BIGINT) AS fiscal_quarter,
      |    CAST(SUM(qty) AS BIGINT) AS total_qty,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
      |    SUM(CAST(gross_c AS DECIMAL(19,0))) AS g,
      |    SUM(CAST(net_c AS DECIMAL(19,0))) AS net_cents,
      |    MIN(CASE WHEN rn = (n + 1) // 2 THEN net_c END) AS med,
      |    MIN(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN net_c END) AS p90
      |  FROM ranked GROUP BY 1, 2
      |), trended AS (
      |  SELECT *,
      |    LAG(net_cents, 1) OVER wd AS prev,
      |    LAG(net_cents, 7) OVER wd AS lw,
      |    SUM(net_cents) OVER w7 AS s7,
      |    CAST(COUNT(*) OVER w7 AS BIGINT) AS c7,
      |    SUM(net_cents) OVER w30 AS s30,
      |    SUM(CAST(net_cents * net_cents AS DECIMAL(38,0))) OVER w30 AS q30,
      |    CAST(COUNT(*) OVER w30 AS BIGINT) AS c30
      |  FROM daily
      |  WINDOW wd AS (ORDER BY day),
      |    w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |    w30 AS (ORDER BY day ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
      |), x AS (
      |  SELECT *,
      |    CAST(s7 AS DOUBLE) / CAST(c7 AS DOUBLE) AS avg7,
      |    CASE WHEN c30 <= 1 THEN NULL
      |         ELSE sqrt((CAST(c30 AS DOUBLE) * ${graft.Exact.bigDecToDoubleSql("q30")} - CAST(s30 AS DOUBLE) * CAST(s30 AS DOUBLE))
      |                   / (CAST(c30 AS DOUBLE) * (CAST(c30 AS DOUBLE) - 1.0))) END AS std30,
      |    CASE WHEN prev IS NULL OR prev = 0 THEN NULL
      |         ELSE (CAST(net_cents AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE) * 100.0 END AS growth,
      |    CASE WHEN lw IS NULL OR lw = 0 THEN NULL
      |         ELSE (CAST(net_cents AS DOUBLE) - CAST(lw AS DOUBLE)) / CAST(lw AS DOUBLE) * 100.0 END AS wow
      |  FROM trended
      |)
      |SELECT day, fiscal_year, fiscal_quarter, n_lines, total_qty, unique_customers,
      |  CAST(g AS DOUBLE) / 100.0 AS gross_revenue,
      |  CAST(net_cents AS DOUBLE) / 100.0 AS net_revenue,
      |  CAST(net_cents AS DOUBLE) / 100.0 / CAST(n_lines AS DOUBLE) AS avg_line_value,
      |  CAST(med AS DOUBLE) / 100.0 AS median_line_value,
      |  CAST(p90 AS DOUBLE) / 100.0 AS p90_line_value,
      |  CAST(prev AS DOUBLE) / 100.0 AS prev_day_revenue,
      |  CAST(lw AS DOUBLE) / 100.0 AS same_day_last_week,
      |  avg7 / 100.0 AS seven_day_avg_revenue,
      |  growth AS daily_growth_pct,
      |  wow AS wow_growth_pct,
      |  std30 / 100.0 AS rolling_30d_stddev,
      |  CASE WHEN abs(growth) > 25.0 THEN 'HIGH_VOLATILITY'
      |       WHEN abs(growth) > 10.0 THEN 'MODERATE_VOLATILITY'
      |       ELSE 'STABLE' END AS volatility_flag,
      |  CASE WHEN CAST(net_cents AS DOUBLE) < avg7 * 0.8 THEN 'UNDERPERFORMING'
      |       WHEN CAST(net_cents AS DOUBLE) > avg7 * 1.2 THEN 'OVERPERFORMING'
      |       ELSE 'NORMAL' END AS performance_flag,
      |  coalesce(std30 > 0.0 AND abs(CAST(net_cents AS DOUBLE) - avg7) > std30 * 2.0, FALSE) AS is_anomaly
      |FROM x""".stripMargin

  // -------------------------------------------------- anomaly-detection KPIs

  /** KPI anomaly detection (reference `:921` — several KPI series stacked
    * into one frame, rolling mean/stddev per series, z-score, anomaly flag
    * + severity ladder). Three monthly series over orders: total revenue,
    * active customers, average order value (exact milli-cents via integer
    * division, so every series is integer-valued and the rolling moments
    * are exact). Rolling window = 12 buckets (the reference's 24 hourly
    * buckets, scaled to the monthly grain). */
  def anomalyKpis(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      date_format(col("o_orderdate"), "yyyy-MM").as("bucket"),
      col("o_custkey"), centsL(col("o_totalprice")).as("cents"))
    val m = o.groupBy("bucket").agg(
      sum(col("cents").cast("decimal(19,0)")).as("__rev"),
      countDistinct(col("o_custkey")).as("__cust"),
      countAll.as("__n"))
    // each series' integer unit is chosen so the 12-bucket Σv² stays well
    // under 2^53 at the gate SFs: DuckDB's decimal→double cast is not
    // correctly rounded above 2^53, so huge exact sums would hash-drift
    // (revenue in whole dollars, average order value in whole cents)
    val series = m.select(lit("monthly_revenue").as("kpi_name"), lit("revenue").as("category"),
        col("bucket"), expr("CAST(__rev AS BIGINT) div 100").as("v"), lit(1.0).as("__scale"))
      .unionByName(m.select(lit("active_customers").as("kpi_name"), lit("customer").as("category"),
        col("bucket"), col("__cust").cast("long").as("v"), lit(1.0).as("__scale")))
      .unionByName(m.select(lit("avg_order_value").as("kpi_name"), lit("revenue").as("category"),
        col("bucket"),
        expr("CAST(__rev AS BIGINT) div __n").as("v"), lit(100.0).as("__scale")))
    val wk = Window.partitionBy(col("kpi_name")).orderBy(col("bucket"))
    val w12 = wk.rowsBetween(-11, 0)
    val x = series
      .withColumn("__s1", sum(col("v").cast("decimal(19,0)")).over(w12))
      .withColumn("__s2", sum((col("v").cast("decimal(19,0)") * col("v").cast("decimal(19,0)")).cast("decimal(38,0)")).over(w12))
      .withColumn("__c", count(lit(1)).over(w12).cast("long"))
      .withColumn("__prev", lag(col("v"), 1).over(wk))
      .withColumn("__yoy", lag(col("v"), 12).over(wk))
    val mean = col("__s1").cast("double") / col("__c").cast("double")
    val sd = rollStd(col("__c"), col("__s1"), col("__s2"))
    val z = when(sd.isNull || !(sd > 0.0), lit(0.0))
      .otherwise(abs(col("v").cast("double") - mean) / sd)
    x.select(
      col("kpi_name"), col("bucket"), col("category"),
      (col("v").cast("double") / col("__scale")).as("value"),
      (mean / col("__scale")).as("rolling_avg"),
      (sd / col("__scale")).as("rolling_stddev"),
      (col("__prev").cast("double") / col("__scale")).as("prev_value"),
      (col("__yoy").cast("double") / col("__scale")).as("yoy_value"),
      z.as("z_score"),
      (z > 2.0).as("is_anomaly"),
      when(z > 3.0, "HIGH").when(z > 2.0, "MEDIUM").otherwise("LOW").as("anomaly_severity"))
  }

  def anomalyKpisOracle: String =
    s"""WITH m AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS bucket,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cust,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1
      |), series AS (
      |  SELECT 'monthly_revenue' AS kpi_name, 'revenue' AS category, bucket, rev // 100 AS v, 1.0 AS scale FROM m
      |  UNION ALL
      |  SELECT 'active_customers', 'customer', bucket, cust, 1.0 FROM m
      |  UNION ALL
      |  SELECT 'avg_order_value', 'revenue', bucket, rev // n, 100.0 FROM m
      |), x AS (
      |  SELECT *,
      |    SUM(CAST(v AS DECIMAL(19,0))) OVER w12 AS s1,
      |    SUM(CAST(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)) AS DECIMAL(38,0))) OVER w12 AS s2,
      |    CAST(COUNT(*) OVER w12 AS BIGINT) AS c,
      |    LAG(v, 1) OVER wk AS prev,
      |    LAG(v, 12) OVER wk AS yoy
      |  FROM series
      |  WINDOW wk AS (PARTITION BY kpi_name ORDER BY bucket),
      |    w12 AS (PARTITION BY kpi_name ORDER BY bucket ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
      |), y AS (
      |  SELECT *,
      |    CAST(s1 AS DOUBLE) / CAST(c AS DOUBLE) AS mean,
      |    CASE WHEN c <= 1 THEN NULL
      |         ELSE sqrt((CAST(c AS DOUBLE) * ${graft.Exact.bigDecToDoubleSql("s2")} - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |                   / (CAST(c AS DOUBLE) * (CAST(c AS DOUBLE) - 1.0))) END AS sd
      |  FROM x
      |), zz AS (
      |  SELECT *,
      |    CASE WHEN sd IS NULL OR NOT (sd > 0.0) THEN 0.0
      |         ELSE abs(CAST(v AS DOUBLE) - mean) / sd END AS z
      |  FROM y
      |)
      |SELECT kpi_name, bucket, category,
      |  CAST(v AS DOUBLE) / scale AS value,
      |  mean / scale AS rolling_avg,
      |  sd / scale AS rolling_stddev,
      |  CAST(prev AS DOUBLE) / scale AS prev_value,
      |  CAST(yoy AS DOUBLE) / scale AS yoy_value,
      |  z AS z_score,
      |  z > 2.0 AS is_anomaly,
      |  CASE WHEN z > 3.0 THEN 'HIGH' WHEN z > 2.0 THEN 'MEDIUM' ELSE 'LOW' END AS anomaly_severity
      |FROM zz""".stripMargin
}
