package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Executive revenue KPIs per time bucket (reference:
  * src/etl/gold/materialized_views_manager.py:237-261 — the
  * executive_revenue_kpis materialized view: bucketed revenue, unique
  * customers, average/median/p95 transaction value, revenue per customer,
  * growth rate vs the previous bucket, high-value counts).
  *
  * Scale shapes: the per-bucket rollup shuffles once on the month key;
  * median/p95 are exact discrete order statistics in integer cents (the
  * reference's PERCENTILE_CONT interpolates — not engine-portable, SURVEY
  * §3); the growth-rate lag window runs over the AGGREGATED frame, whose row
  * count is bounded by the calendar (≤ ~80 months at any SF), so the
  * unpartitioned window is constant-size, never data-size. */
object ExecKpis {

  def revenueKpis(spark: SparkSession, dir: String, highValueCents: Long = 30000000L): DataFrame = {
    val o = Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("bucket"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("cents"), col("o_orderkey"))
    val ranked = o
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("bucket"))).cast("long"))
    val agg = ranked.groupBy(col("bucket"), col("n").as("total_orders"))
      .agg(
        sum(col("cents").cast("decimal(19,0)")).as("__rev"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        sum(when(col("cents") > highValueCents, 1L).otherwise(0L)).cast("long").as("high_value_orders"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("cents"))).as("__med"),
        min(when(col("rn") === ceil(col("n") * 0.95), col("cents"))).as("__p95"))
    val rev = col("__rev").cast("double") / lit(100.0)
    val kpis = agg.select(
      col("bucket"), col("total_orders"), col("unique_customers"), col("high_value_orders"),
      rev.as("total_revenue"),
      (rev / col("total_orders").cast("double")).as("avg_order_value"),
      when(col("unique_customers") === 0, lit(null).cast("double"))
        .otherwise(rev / col("unique_customers").cast("double")).as("revenue_per_customer"),
      (col("__med").cast("double") / 100.0).as("median_order_value"),
      (col("__p95").cast("double") / 100.0).as("p95_order_value"))
    // growth vs previous bucket: calendar-bounded window over the rollup
    val wb = Window.orderBy(col("bucket"))
    kpis.withColumn("__prev", RankOps.boundedFrame("exec_kpis_buckets",
      lag(col("total_revenue"), 1).over(wb)))
      .withColumn("revenue_growth_pct",
        when(col("__prev").isNull || col("__prev") === 0.0, lit(null).cast("double"))
          .otherwise((col("total_revenue") - col("__prev")) / col("__prev") * lit(100.0)))
      .drop("__prev")
  }

  /** DuckDB oracle mirroring revenueKpis. */
  def revenueKpisOracle: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m') AS bucket,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), ranked AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n
      |  FROM o
      |), agg AS (
      |  SELECT bucket, n AS total_orders,
      |    SUM(CAST(cents AS DECIMAL(19,0))) AS rev,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
      |    CAST(SUM(CASE WHEN cents > 30000000 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_orders,
      |    MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med,
      |    MIN(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN cents END) AS p95
      |  FROM ranked GROUP BY 1, 2
      |), k AS (
      |  SELECT bucket, total_orders, unique_customers, high_value_orders,
      |    CAST(rev AS DOUBLE) / 100.0 AS total_revenue,
      |    (CAST(rev AS DOUBLE) / 100.0) / CAST(total_orders AS DOUBLE) AS avg_order_value,
      |    CASE WHEN unique_customers = 0 THEN NULL
      |         ELSE (CAST(rev AS DOUBLE) / 100.0) / CAST(unique_customers AS DOUBLE)
      |    END AS revenue_per_customer,
      |    CAST(med AS DOUBLE) / 100.0 AS median_order_value,
      |    CAST(p95 AS DOUBLE) / 100.0 AS p95_order_value
      |  FROM agg
      |)
      |SELECT *,
      |  CASE WHEN LAG(total_revenue) OVER (ORDER BY bucket) IS NULL
      |         OR LAG(total_revenue) OVER (ORDER BY bucket) = 0.0 THEN NULL
      |       ELSE (total_revenue - LAG(total_revenue) OVER (ORDER BY bucket))
      |            / LAG(total_revenue) OVER (ORDER BY bucket) * 100.0
      |  END AS revenue_growth_pct
      |FROM k""".stripMargin
}
