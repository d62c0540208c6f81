package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-metric trend monitoring and GDPR subject erasure.
  *
  * quality_trends (reference: src/data_quality/monitoring/quality_monitor.py
  * :541-612 `get_quality_trends`): per metric series, compare the first-half
  * and second-half averages — improving/declining, overridden to stable when
  * the gap is under 0.01 — plus change %, current/min/max/avg and the point
  * count. The reference buffers metric points in memory and loops; here each
  * metric is a per-day BIGINT series off one rollup shuffle (exact integer
  * half-sums ⇒ the averages are deterministic ratios; a double series would
  * accumulate in engine-specific order). The stacked per-metric frame is
  * calendar-bounded, so its windows are constant-size at any SF.
  *
  * subject_erasure (reference: src/core/security/compliance_framework.py:495
  * `_check_data_deletion_capability` — the GDPR right-to-erasure the
  * reference's checklist attests; here the actual purge): anti-join the
  * subject set out of every customer-keyed table and report per-table
  * before/purged/after counts. The subject list is a deterministic key set
  * (custkey % 97 = 0 — the synthetic-request convention); the purge is one
  * key-shuffle anti-join per table at any scale.
  */
object Monitoring {

  def qualityTrends(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("day")
      .agg(
        countAll.as("daily_volume"),
        sum(col("cents").cast("decimal(19,0)")).cast("long").as("daily_revenue_cents"),
        sum(when(col("cents") > 30000000L, 1L).otherwise(0L)).cast("long")
          .as("daily_high_value_orders"))
    val stacked = daily.select(col("day"), expr(
      """stack(3,
        |  'daily_volume', daily_volume,
        |  'daily_revenue', daily_revenue_cents,
        |  'daily_high_value_orders', daily_high_value_orders
        |) AS (metric_name, v)""".stripMargin))
    val w = Window.partitionBy("metric_name").orderBy("day")
    val ranked = stacked
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("metric_name")).cast("long"))
    val agg = ranked.groupBy(col("metric_name"), col("n").as("data_points"))
      .agg(
        sum(when(col("rn") <= expr("n div 2"), col("v"))).as("s1"),
        sum(when(col("rn") > expr("n div 2"), col("v"))).as("s2"),
        min(when(col("rn") === col("n"), col("v"))).as("cur"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        sum(col("v")).as("s"))
    // the reference scales dollar metrics back out of cents at report time
    val unit = when(col("metric_name") === "daily_revenue", 100.0).otherwise(1.0)
    val k1 = expr("data_points div 2").cast("double")
    val k2 = (col("data_points") - expr("data_points div 2")).cast("double")
    val f = col("s1").cast("double") / k1 / unit
    val sAvg = col("s2").cast("double") / k2 / unit
    agg
      .withColumn("first_half_avg", f)
      .withColumn("second_half_avg", sAvg)
      .withColumn("direction",
        when(abs(col("second_half_avg") - col("first_half_avg")) < 0.01, "stable")
          .when(col("second_half_avg") > col("first_half_avg"), "improving")
          .otherwise("declining"))
      .withColumn("change_percentage",
        when(col("first_half_avg") === 0.0, 0.0)
          .otherwise((col("second_half_avg") - col("first_half_avg"))
            / col("first_half_avg") * lit(100.0)))
      .withColumn("current_value", col("cur").cast("double") / unit)
      .withColumn("min_value", col("mn").cast("double") / unit)
      .withColumn("max_value", col("mx").cast("double") / unit)
      .withColumn("avg_value", col("s").cast("double") / col("data_points").cast("double") / unit)
      .select("metric_name", "data_points", "first_half_avg", "second_half_avg",
        "direction", "change_percentage", "current_value", "min_value", "max_value",
        "avg_value")
  }

  def qualityTrendsOracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    COUNT(*) AS daily_volume,
      |    CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(19,0))) AS BIGINT) AS daily_revenue_cents,
      |    CAST(SUM(CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) > 30000000 THEN 1 ELSE 0 END) AS BIGINT) AS daily_high_value_orders
      |  FROM orders GROUP BY 1
      |), stacked AS (
      |  SELECT day, 'daily_volume' AS metric_name, CAST(daily_volume AS BIGINT) AS v FROM daily
      |  UNION ALL
      |  SELECT day, 'daily_revenue', daily_revenue_cents FROM daily
      |  UNION ALL
      |  SELECT day, 'daily_high_value_orders', daily_high_value_orders FROM daily
      |), ranked AS (
      |  SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY metric_name ORDER BY day) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY metric_name) AS BIGINT) AS n
      |  FROM stacked
      |), agg AS (
      |  SELECT metric_name, n AS data_points,
      |    CAST(SUM(CASE WHEN rn <= n // 2 THEN v END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN rn > n // 2 THEN v END) AS BIGINT) AS s2,
      |    MIN(CASE WHEN rn = n THEN v END) AS cur,
      |    MIN(v) AS mn, MAX(v) AS mx, CAST(SUM(v) AS BIGINT) AS s
      |  FROM ranked GROUP BY 1, 2
      |), u AS (
      |  SELECT *, CASE WHEN metric_name = 'daily_revenue' THEN 100.0 ELSE 1.0 END AS unit,
      |    CAST(data_points // 2 AS DOUBLE) AS k1,
      |    CAST(data_points - data_points // 2 AS DOUBLE) AS k2
      |  FROM agg
      |), p AS (
      |  SELECT metric_name, data_points,
      |    CAST(s1 AS DOUBLE) / k1 / unit AS first_half_avg,
      |    CAST(s2 AS DOUBLE) / k2 / unit AS second_half_avg,
      |    CAST(cur AS DOUBLE) / unit AS current_value,
      |    CAST(mn AS DOUBLE) / unit AS min_value,
      |    CAST(mx AS DOUBLE) / unit AS max_value,
      |    CAST(s AS DOUBLE) / CAST(data_points AS DOUBLE) / unit AS avg_value
      |  FROM u
      |)
      |SELECT metric_name, data_points, first_half_avg, second_half_avg,
      |  CASE WHEN abs(second_half_avg - first_half_avg) < 0.01 THEN 'stable'
      |       WHEN second_half_avg > first_half_avg THEN 'improving'
      |       ELSE 'declining' END AS direction,
      |  CASE WHEN first_half_avg = 0.0 THEN 0.0
      |       ELSE (second_half_avg - first_half_avg) / first_half_avg * 100.0 END AS change_percentage,
      |  current_value, min_value, max_value, avg_value
      |FROM p""".stripMargin

  /** GDPR right-to-erasure purge report: remove a subject key set from every
    * customer-keyed table, report per-table before/purged/after. The purge
    * frames themselves are the library surface (`erase`); the report proves
    * the cascade covered every table. */
  def erase(df: DataFrame, keyCol: String, subjects: DataFrame): DataFrame =
    df.join(subjects.withColumnRenamed(subjects.columns.head, keyCol),
      Seq(keyCol), "left_anti")

  def subjectErasure(spark: SparkSession, dir: String): DataFrame = {
    val subjects = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey").as("k"))
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    // lineitem is order-keyed: the cascade resolves subject orders first
    val l = Tables.lineitem(spark, dir)
    val subjectOrders = o.join(subjects, o("o_custkey") === col("k"))
      .select(col("o_orderkey").as("ok"))
    def report(name: String, df: DataFrame, purged: DataFrame): DataFrame = {
      val before = df.agg(countAll.as("rows_before"))
      val after = purged.agg(countAll.as("rows_after"))
      before.crossJoin(after).select(
        lit(name).as("table_name"), col("rows_before"),
        (col("rows_before") - col("rows_after")).as("rows_purged"),
        col("rows_after"))
    }
    report("customer", c, erase(c, "c_custkey", subjects))
      .union(report("orders", o, erase(o, "o_custkey", subjects)))
      .union(report("lineitem", l,
        l.join(subjectOrders, l("l_orderkey") === col("ok"), "left_anti")))
  }

  def subjectErasureOracle: String =
    """WITH subjects AS (
      |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
      |), so AS (
      |  SELECT o_orderkey AS ok FROM orders JOIN subjects ON o_custkey = k
      |)
      |SELECT 'customer' AS table_name,
      |  CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS rows_before,
      |  CAST((SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT k FROM subjects)) AS BIGINT) AS rows_purged,
      |  CAST((SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM subjects)) AS BIGINT) AS rows_after
      |UNION ALL
      |SELECT 'orders',
      |  CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IN (SELECT k FROM subjects)) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM subjects)) AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem',
      |  CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IN (SELECT ok FROM so)) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT ok FROM so)) AS BIGINT)""".stripMargin
}
