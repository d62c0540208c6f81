package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream (reference:
  * src/streaming/realtime_analytics_ml.py:997-1060
  * `_apply_behavioral_analytics` — shopping-pattern ladder, 24-hour purchase
  * velocity, customer lifecycle stage; the reference computes them per
  * micro-batch over a 24h range window keyed by customer).
  *
  * Spark shape: per-user RANGE windows ordered by microsecond epoch — range
  * frames aggregate ALL timestamp peers, so the result is order-independent
  * within ties (deterministic without a tie-breaker, SURVEY §3). One shuffle
  * on user_id serves all three window features; the lifecycle join is
  * co-keyed with it; the corpus as-of timestamp is a broadcast scalar.
  *
  * Determinism: event values become integer cents before the windowed sums
  * (windowed SUM over doubles has engine-specific accumulation order);
  * the 30-day average recomputes from the exact windowed sum/count with the
  * identical IEEE expression in the oracle. Velocity divides an exact count
  * by 24.0. Recency buckets use whole-day integer arithmetic on µs epochs.
  */
object Behavior {

  def behavioralAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("ts"),
      unix_micros(col("ts")).as("es"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    val day = 86400000000L // µs
    val wVel = Window.partitionBy("user_id").orderBy("es").rangeBetween(-day, 0)
    val w7 = Window.partitionBy("user_id").orderBy("es").rangeBetween(-7 * day, 0)
    val w30 = Window.partitionBy("user_id").orderBy("es").rangeBetween(-30 * day, 0)
    val asof = e.agg(max(col("es")).as("g"))
    val windowed = e
      // purchases only — the reference's stream is all purchases so it counts
      // rows; over a multi-type event stream the purchase-named metric must
      // filter, or 24 views would read as 1 purchase/hour
      .withColumn("purchase_velocity",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(wVel)
          .cast("double") / lit(24.0))
      .withColumn("events_7d", count(lit(1)).over(w7).cast("long"))
      .withColumn("__sum30", sum(col("cents")).over(w30))
      .withColumn("__n30", count(lit(1)).over(w30))
      .withColumn("avg_value_30d",
        col("__sum30").cast("double") / 100.0 / col("__n30").cast("double"))
    val staged = windowed.crossJoin(broadcast(asof))
      .withColumn("__recency_days", expr("(g - es) div 86400000000"))
      .withColumn("lifecycle_stage",
        when(col("__recency_days") <= 7, "active")
          .when(col("__recency_days") <= 30, "regular")
          .when(col("__recency_days") <= 90, "at_risk")
          .otherwise("dormant"))
      .withColumn("is_weekend", dayofweek(col("ts")).isin(1, 7))
      .withColumn("shopping_pattern",
        when(col("events_7d") > 5, "frequent")
          .when(col("avg_value_30d") > 100.0, "high_value")
          .when(col("is_weekend"), "weekend_shopper")
          .otherwise("casual"))
    staged.select(
      col("event_id"), col("user_id"), col("event_type"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
      col("purchase_velocity"), col("events_7d"), col("avg_value_30d"),
      col("is_weekend"), col("shopping_pattern"), col("lifecycle_stage"))
  }

  def behavioralAnalyticsOracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, ts,
      |    epoch_us(ts) AS es,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), w AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY es
      |      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 24.0
      |      AS purchase_velocity,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY es
      |      RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_7d,
      |    CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY es
      |      RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum30,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY es
      |      RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS n30
      |  FROM e
      |), x AS (SELECT MAX(es) AS g FROM e),
      |s AS (
      |  SELECT w.*, CAST(sum30 AS DOUBLE) / 100.0 / CAST(n30 AS DOUBLE) AS avg_value_30d,
      |    (g - es) // 86400000000 AS recency_days,
      |    dayofweek(ts) IN (0, 6) AS is_weekend
      |  FROM w CROSS JOIN x
      |)
      |SELECT event_id, user_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
      |  purchase_velocity, events_7d, avg_value_30d, is_weekend,
      |  CASE WHEN events_7d > 5 THEN 'frequent'
      |       WHEN avg_value_30d > 100.0 THEN 'high_value'
      |       WHEN is_weekend THEN 'weekend_shopper'
      |       ELSE 'casual' END AS shopping_pattern,
      |  CASE WHEN recency_days <= 7 THEN 'active'
      |       WHEN recency_days <= 30 THEN 'regular'
      |       WHEN recency_days <= 90 THEN 'at_risk'
      |       ELSE 'dormant' END AS lifecycle_stage
      |FROM s""".stripMargin
}
