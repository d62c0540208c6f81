package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Customer churn-risk scoring and lifetime-value prediction (reference:
  * dbt/macros/advanced_analytics.sql:3-141 `customer_churn_prediction` and
  * dbt/macros/dimensional_modeling.sql:3-109
  * `calculate_customer_lifetime_value`).
  *
  * The reference macros anchor on `current_date`; a wall-clock anchor is
  * non-reproducible, so both operators anchor on the corpus as-of date
  * (max order date) — a one-row broadcast scalar, constant at any SF.
  *
  * Determinism (SURVEY.md §3): money as integer cents summed in DECIMAL;
  * ratios written as the identical IEEE expression in the DuckDB oracle;
  * risk ladders compare ints/cents, probability tiers are exact literals.
  * The reference's `round(x, 2)` on CLV is not engine-portable (SURVEY §3);
  * CLV rounds to integer cents instead — same precision, portable.
  *
  * Scale shapes: one shuffle each — orders aggregate by customer key; the
  * churn query joins that aggregate to customer on the same key (co-keyed);
  * the as-of scalar is a broadcast; the CASE ladders are codegen'd
  * projections. No window functions, no global sorts.
  */
object Churn {

  /** Per-customer order aggregates anchored on the corpus as-of date.
    * Shared by both scores. */
  private def activity(spark: SparkSession, dir: String, churnDays: Int): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      col("o_orderdate").cast("date").as("d"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val asof = o.agg(max(col("d")).as("asof"))
    o.crossJoin(broadcast(asof))
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(
        min(col("d")).as("first_purchase"),
        max(col("d")).as("last_transaction_date"),
        max(col("asof")).as("asof"),
        count(lit(1)).as("total_orders"),
        sum(col("cents").cast("decimal(19,0)")).cast("long").as("total_cents"),
        sum(when(col("d") >= date_sub(col("asof"), churnDays), col("cents"))
          .otherwise(0L).cast("decimal(19,0)")).cast("long").as("recent_cents"),
        sum(when(col("d").between(date_sub(col("asof"), churnDays * 2),
            date_sub(col("asof"), churnDays)), col("cents"))
          .otherwise(0L).cast("decimal(19,0)")).cast("long").as("previous_cents"),
        sum(when(col("d") >= date_sub(col("asof"), churnDays), 1L).otherwise(0L))
          .cast("long").as("recent_transactions"))
  }

  /** Churn-risk scoring: four 0-5 risk ladders (recency, frequency, revenue
    * trend, activity), composite 0-20 score, probability tier, category and
    * recommended action (reference dbt/macros/advanced_analytics.sql:53-135).
    * Customers with no orders take the reference's else-branches (risk 5). */
  def churnRisk(spark: SparkSession, dir: String, churnDays: Int = 90): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("customer_id"))
    val a = activity(spark, dir, churnDays)
    val base = c.join(a, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("first_purchase"), col("last_transaction_date"),
        datediff(col("asof"), col("last_transaction_date")).cast("long")
          .as("days_since_last_transaction"),
        coalesce(col("total_orders"), lit(0L)).as("total_orders"),
        (coalesce(col("total_cents"), lit(0L)).cast("double") / 100.0).as("total_spent"),
        coalesce(col("recent_cents"), lit(0L)).as("__recent_cents"),
        coalesce(col("previous_cents"), lit(0L)).as("__previous_cents"),
        coalesce(col("recent_transactions"), lit(0L)).as("recent_transactions"),
        when(col("total_orders").isNotNull,
          col("total_cents").cast("double") / 100.0 / col("total_orders").cast("double"))
          .as("avg_transaction_value"),
        when(col("first_purchase").isNotNull,
          col("total_orders").cast("double") * 30.0 /
            greatest(datediff(col("asof"), col("first_purchase")), lit(1)).cast("double"))
          .as("purchase_frequency_monthly"))
    val dsl = col("days_since_last_transaction")
    val freq = col("purchase_frequency_monthly")
    val rec = col("__recent_cents")
    val prev = col("__previous_cents")
    val scored = base
      .withColumn("recency_risk",
        when(dsl <= 7, 0).when(dsl <= 30, 1).when(dsl <= 60, 2)
          .when(dsl <= 90, 3).when(dsl <= 180, 4).otherwise(5))
      .withColumn("frequency_risk",
        when(freq >= 2.0, 0).when(freq >= 1.0, 1).when(freq >= 0.5, 2)
          .when(freq >= 0.25, 3).when(freq >= 0.1, 4).otherwise(5))
      .withColumn("revenue_trend_risk",
        when(rec.cast("double") > prev.cast("double") * 1.2, 0)
          .when(rec.cast("double") > prev.cast("double") * 0.8, 1)
          .when(rec.cast("double") > prev.cast("double") * 0.5, 2)
          .when(rec.cast("double") > prev.cast("double") * 0.2, 3)
          .when(rec > 0L, 4).otherwise(5))
      .withColumn("activity_risk",
        when(col("recent_transactions") >= 5L, 0)
          .when(col("recent_transactions") >= 3L, 1)
          .when(col("recent_transactions") >= 2L, 2)
          .when(col("recent_transactions") >= 1L, 3)
          .when(col("recent_transactions") === 0L && dsl <= 180, 4)
          .otherwise(5))
    val score = col("recency_risk") + col("frequency_risk") +
      col("revenue_trend_risk") + col("activity_risk")
    scored
      .withColumn("churn_risk_score", score)
      .withColumn("churn_probability",
        when(score <= 4, 0.1).when(score <= 8, 0.3).when(score <= 12, 0.6)
          .when(score <= 16, 0.8).otherwise(0.95))
      .withColumn("churn_risk_category",
        when(score <= 4, "Low Risk").when(score <= 8, "Medium Risk")
          .when(score <= 12, "High Risk").otherwise("Critical Risk"))
      .withColumn("recommended_action",
        when(col("recency_risk") >= 4, "Re-engagement Campaign")
          .when(col("frequency_risk") >= 4, "Increase Purchase Frequency")
          .when(col("revenue_trend_risk") >= 4, "Value Recovery Campaign")
          .when(col("activity_risk") >= 4, "Activity Stimulation")
          .otherwise("Monitor"))
      .withColumn("recent_revenue", col("__recent_cents").cast("double") / 100.0)
      .withColumn("previous_period_revenue", col("__previous_cents").cast("double") / 100.0)
      .drop("__recent_cents", "__previous_cents")
  }

  def churnRiskOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), x AS (SELECT MAX(d) AS ref_date FROM o),
      |a AS (
      |  SELECT o_custkey AS customer_id,
      |    MIN(d) AS first_purchase, MAX(d) AS last_transaction_date, MAX(ref_date) AS ref_date,
      |    CAST(COUNT(*) AS BIGINT) AS total_orders,
      |    CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS BIGINT) AS total_cents,
      |    CAST(SUM(CAST(CASE WHEN d >= ref_date - 90 THEN cents ELSE 0 END AS DECIMAL(19,0))) AS BIGINT) AS recent_cents,
      |    CAST(SUM(CAST(CASE WHEN d BETWEEN ref_date - 180 AND ref_date - 90 THEN cents ELSE 0 END AS DECIMAL(19,0))) AS BIGINT) AS previous_cents,
      |    CAST(SUM(CASE WHEN d >= ref_date - 90 THEN 1 ELSE 0 END) AS BIGINT) AS recent_transactions
      |  FROM o CROSS JOIN x GROUP BY 1
      |), base AS (
      |  SELECT c.c_custkey AS customer_id, a.first_purchase, a.last_transaction_date,
      |    CAST(date_diff('day', a.last_transaction_date, a.ref_date) AS BIGINT) AS days_since_last_transaction,
      |    COALESCE(a.total_orders, 0) AS total_orders,
      |    CAST(COALESCE(a.total_cents, 0) AS DOUBLE) / 100.0 AS total_spent,
      |    COALESCE(a.recent_cents, 0) AS recent_cents,
      |    COALESCE(a.previous_cents, 0) AS previous_cents,
      |    COALESCE(a.recent_transactions, 0) AS recent_transactions,
      |    CASE WHEN a.total_orders IS NOT NULL
      |         THEN CAST(a.total_cents AS DOUBLE) / 100.0 / CAST(a.total_orders AS DOUBLE) END
      |      AS avg_transaction_value,
      |    CASE WHEN a.first_purchase IS NOT NULL
      |         THEN CAST(a.total_orders AS DOUBLE) * 30.0 /
      |              CAST(greatest(date_diff('day', a.first_purchase, a.ref_date), 1) AS DOUBLE) END
      |      AS purchase_frequency_monthly
      |  FROM customer c LEFT JOIN a ON c.c_custkey = a.customer_id
      |), scored AS (
      |  SELECT *,
      |    CASE WHEN days_since_last_transaction <= 7 THEN 0
      |         WHEN days_since_last_transaction <= 30 THEN 1
      |         WHEN days_since_last_transaction <= 60 THEN 2
      |         WHEN days_since_last_transaction <= 90 THEN 3
      |         WHEN days_since_last_transaction <= 180 THEN 4 ELSE 5 END AS recency_risk,
      |    CASE WHEN purchase_frequency_monthly >= 2.0 THEN 0
      |         WHEN purchase_frequency_monthly >= 1.0 THEN 1
      |         WHEN purchase_frequency_monthly >= 0.5 THEN 2
      |         WHEN purchase_frequency_monthly >= 0.25 THEN 3
      |         WHEN purchase_frequency_monthly >= 0.1 THEN 4 ELSE 5 END AS frequency_risk,
      |    CASE WHEN CAST(recent_cents AS DOUBLE) > CAST(previous_cents AS DOUBLE) * 1.2 THEN 0
      |         WHEN CAST(recent_cents AS DOUBLE) > CAST(previous_cents AS DOUBLE) * 0.8 THEN 1
      |         WHEN CAST(recent_cents AS DOUBLE) > CAST(previous_cents AS DOUBLE) * 0.5 THEN 2
      |         WHEN CAST(recent_cents AS DOUBLE) > CAST(previous_cents AS DOUBLE) * 0.2 THEN 3
      |         WHEN recent_cents > 0 THEN 4 ELSE 5 END AS revenue_trend_risk,
      |    CASE WHEN recent_transactions >= 5 THEN 0
      |         WHEN recent_transactions >= 3 THEN 1
      |         WHEN recent_transactions >= 2 THEN 2
      |         WHEN recent_transactions >= 1 THEN 3
      |         WHEN recent_transactions = 0 AND days_since_last_transaction <= 180 THEN 4
      |         ELSE 5 END AS activity_risk
      |  FROM base
      |)
      |SELECT customer_id, first_purchase, last_transaction_date,
      |  days_since_last_transaction, total_orders, total_spent,
      |  recent_transactions, avg_transaction_value, purchase_frequency_monthly,
      |  recency_risk, frequency_risk, revenue_trend_risk, activity_risk,
      |  recency_risk + frequency_risk + revenue_trend_risk + activity_risk AS churn_risk_score,
      |  CASE WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 4 THEN 0.1
      |       WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 8 THEN 0.3
      |       WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 12 THEN 0.6
      |       WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 16 THEN 0.8
      |       ELSE 0.95 END AS churn_probability,
      |  CASE WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 4 THEN 'Low Risk'
      |       WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 8 THEN 'Medium Risk'
      |       WHEN recency_risk + frequency_risk + revenue_trend_risk + activity_risk <= 12 THEN 'High Risk'
      |       ELSE 'Critical Risk' END AS churn_risk_category,
      |  CASE WHEN recency_risk >= 4 THEN 'Re-engagement Campaign'
      |       WHEN frequency_risk >= 4 THEN 'Increase Purchase Frequency'
      |       WHEN revenue_trend_risk >= 4 THEN 'Value Recovery Campaign'
      |       WHEN activity_risk >= 4 THEN 'Activity Stimulation'
      |       ELSE 'Monitor' END AS recommended_action,
      |  CAST(recent_cents AS DOUBLE) / 100.0 AS recent_revenue,
      |  CAST(previous_cents AS DOUBLE) / 100.0 AS previous_period_revenue
      |FROM scored""".stripMargin

  /** Customer lifetime value: historical spend plus a predicted component —
    * avg order value × projected purchases × 30% gross margin × retention —
    * bucketed into value segments (reference
    * dbt/macros/dimensional_modeling.sql:39-105). Rounds to integer cents
    * (portable) instead of the reference's round(x, 2). */
  def customerClv(spark: SparkSession, dir: String, predictionMonths: Int = 12): DataFrame = {
    val predictionDays = predictionMonths * 30
    val a = activity(spark, dir, churnDays = 90)
      .filter(col("total_orders") > 0L)
    val lifetime = datediff(col("asof"), col("first_purchase")).cast("long")
    val recencyDays = datediff(col("asof"), col("last_transaction_date")).cast("long")
    val base = a.select(
      col("customer_id"),
      (col("total_cents").cast("double") / 100.0).as("historical_value"),
      (col("total_cents").cast("double") / 100.0 / col("total_orders").cast("double"))
        .as("avg_order_value"),
      lifetime.as("lifetime_days"),
      when(lifetime > 0L, col("total_orders").cast("double") / lifetime.cast("double"))
        .otherwise(0.0).as("purchase_frequency_per_day"),
      when(recencyDays <= 30, 0.1).when(recencyDays <= 90, 0.3)
        .when(recencyDays <= 180, 0.6).when(recencyDays <= 365, 0.8)
        .otherwise(0.95).as("churn_probability"),
      col("total_cents"))
    // CLV = AOV × (freq/day × horizon) × 0.3 margin × (1 − churn); parenthesized
    // identically in the oracle — one IEEE evaluation order on both engines
    val predictedCents = round(
      col("avg_order_value") * (col("purchase_frequency_per_day") * lit(predictionDays.toDouble)) *
        lit(0.3) * (lit(1.0) - col("churn_probability")) * 100.0, 0).cast("long")
    base
      .withColumn("__pred_cents", predictedCents)
      .withColumn("predicted_clv", col("__pred_cents").cast("double") / 100.0)
      .withColumn("__total_cents_clv", col("total_cents") + col("__pred_cents"))
      .withColumn("total_clv", col("__total_cents_clv").cast("double") / 100.0)
      .withColumn("clv_segment",
        when(col("__total_cents_clv") >= 100000L, "High Value")
          .when(col("__total_cents_clv") >= 50000L, "Medium Value")
          .when(col("__total_cents_clv") >= 10000L, "Low Value")
          .otherwise("Minimal Value"))
      .drop("total_cents", "__pred_cents", "__total_cents_clv")
  }

  def customerClvOracle: String =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), x AS (SELECT MAX(d) AS ref_date FROM o),
      |a AS (
      |  SELECT o_custkey AS customer_id,
      |    MIN(d) AS first_purchase, MAX(d) AS last_purchase, MAX(ref_date) AS ref_date,
      |    CAST(COUNT(*) AS BIGINT) AS total_orders,
      |    CAST(SUM(CAST(cents AS DECIMAL(19,0))) AS BIGINT) AS total_cents
      |  FROM o CROSS JOIN x GROUP BY 1
      |), base AS (
      |  SELECT customer_id,
      |    CAST(total_cents AS DOUBLE) / 100.0 AS historical_value,
      |    CAST(total_cents AS DOUBLE) / 100.0 / CAST(total_orders AS DOUBLE) AS avg_order_value,
      |    CAST(date_diff('day', first_purchase, ref_date) AS BIGINT) AS lifetime_days,
      |    CASE WHEN date_diff('day', first_purchase, ref_date) > 0
      |         THEN CAST(total_orders AS DOUBLE) / CAST(date_diff('day', first_purchase, ref_date) AS DOUBLE)
      |         ELSE 0.0 END AS purchase_frequency_per_day,
      |    CASE WHEN date_diff('day', last_purchase, ref_date) <= 30 THEN 0.1
      |         WHEN date_diff('day', last_purchase, ref_date) <= 90 THEN 0.3
      |         WHEN date_diff('day', last_purchase, ref_date) <= 180 THEN 0.6
      |         WHEN date_diff('day', last_purchase, ref_date) <= 365 THEN 0.8
      |         ELSE 0.95 END AS churn_probability,
      |    total_cents
      |  FROM a WHERE total_orders > 0
      |), p AS (
      |  SELECT *,
      |    CAST(round(avg_order_value * (purchase_frequency_per_day * 360.0) *
      |         0.3 * (1.0 - churn_probability) * 100.0) AS BIGINT) AS pred_cents
      |  FROM base
      |)
      |SELECT customer_id, historical_value, avg_order_value, lifetime_days,
      |  purchase_frequency_per_day, churn_probability,
      |  CAST(pred_cents AS DOUBLE) / 100.0 AS predicted_clv,
      |  CAST(total_cents + pred_cents AS DOUBLE) / 100.0 AS total_clv,
      |  CASE WHEN total_cents + pred_cents >= 100000 THEN 'High Value'
      |       WHEN total_cents + pred_cents >= 50000 THEN 'Medium Value'
      |       WHEN total_cents + pred_cents >= 10000 THEN 'Low Value'
      |       ELSE 'Minimal Value' END AS clv_segment
      |FROM p""".stripMargin
}
