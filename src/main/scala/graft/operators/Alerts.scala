package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-metric alerting (reference: src/analytics/bi_dashboard_integration
  * .py:138-167, _initialize_alert_thresholds — warning/critical/emergency
  * ladders per KPI; the dashboard evaluates live metrics against them).
  *
  * Re-expressed as one long-format alert evaluation per month over the sales
  * corpus: revenue growth rate (MoM, from exact decimal sums) and customer
  * retention rate (share of last month's buyers who bought again). Both
  * values are exact-count/exact-sum IEEE ratios, so the query is
  * oracle-exact.
  *
  * Scale: the month-over-month lag window runs on the ~80-row post-aggregate
  * frame (single-partition there is free — same rationale as
  * Quality.rareCategories); the retention self-join shuffles on the customer
  * key, which scales with the fact table.
  */
object Alerts {
  import Exact._

  def businessAlerts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      col("o_totalprice"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("long").as("ym"))

    // revenue growth rate per month (threshold ladder at :141-145)
    val monthly = o.groupBy(col("ym")).agg(decSum(col("o_totalprice")).as("rev"))
    val wSeq = Window.orderBy(col("ym")) // ~80-row aggregate frame
    val growth = monthly
      .withColumn("prev_rev", RankOps.boundedFrame("business_alerts_monthly",
        lag(col("rev"), 1).over(wSeq)))
      .filter(col("prev_rev").isNotNull)
      .select(col("ym"),
        lit("revenue_growth_rate").as("metric"),
        ((Exact.dec6ToDouble(col("rev")) - Exact.dec6ToDouble(col("prev_rev")))
          / Exact.dec6ToDouble(col("prev_rev"))).as("value"))
      .withColumn("severity",
        when(col("value") <= -0.20, "emergency")
          .when(col("value") <= -0.10, "critical")
          .when(col("value") <= -0.05, "warning")
          .otherwise("ok"))

    // customer retention rate per month (threshold ladder at :146-150):
    // |buyers(m-1) ∩ buyers(m)| / |buyers(m-1)|
    val active = o.select(col("o_custkey"), col("ym")).distinct()
    val prevCounts = active.groupBy(col("ym")).agg(countAll.as("prev_buyers"))
    val retained = active.as("p")
      .join(active.as("c"),
        col("p.o_custkey") === col("c.o_custkey") && col("c.ym") === col("p.ym") + 1)
      .groupBy(col("p.ym").as("prev_ym"))
      .agg(countAll.as("retained_buyers"))
    // only emit retention for months that actually exist in the data (the
    // final month would otherwise produce a phantom month+1 row)
    val months = monthly.select((col("ym") - 1).as("ym"))
    val retention = prevCounts
      .join(retained, prevCounts("ym") === retained("prev_ym"), "left")
      .join(broadcast(months), Seq("ym"), "semi")
      .select((col("ym") + 1).as("ym"),
        lit("customer_retention_rate").as("metric"),
        (coalesce(col("retained_buyers"), lit(0L)).cast("double")
          / col("prev_buyers").cast("double")).as("value"))
      .withColumn("severity",
        when(col("value") < 0.65, "emergency")
          .when(col("value") < 0.75, "critical")
          .when(col("value") < 0.85, "warning")
          .otherwise("ok"))

    growth.unionAll(retention)
      .withColumn("alert_year", expr("ym div 12").cast("long"))
      .withColumn("alert_month", (col("ym") % 12 + 1).cast("long"))
      .withColumn("is_alert", col("severity") =!= "ok")
      .drop("ym")
  }
}
