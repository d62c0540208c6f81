package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The realtime ML feature catalog and rule-based anomaly composite
  * (reference: src/streaming/realtime_analytics_ml.py — _load_builtin_features
  * :167-307 defines window-expression features per entity;
  * _apply_anomaly_detection:952-990 stacks weighted boolean rules into a
  * composite score).
  *
  * Batch analogs of the streaming feature expressions, with every windowed
  * moment computed from exact decimal sums so the outputs are
  * bit-deterministic (SURVEY.md §3: raw-moment variance over RANGE frames —
  * the shifted-center trick is unavailable because the center changes per
  * frame, but Σx and Σx² in integer cents are exact, and the variance
  * projection is one fixed IEEE sequence).
  */
object RealtimeFeatures {
  import Exact._

  /** Product-side rolling features over lineitem ordered by ship date
    * (reference :210-260: product_popularity_score 1h count,
    * product_price_volatility 24h stddev, product_return_rate 7d avg —
    * re-grained to 7/30/7 days on the date-grain test corpus).
    * All three RANGE frames share one (l_partkey, l_shipdate) sort. */
  def productFeatures(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_shipdate").cast("date").as("ship_date"),
        col("l_extendedprice"), col("l_returnflag"))
      .withColumn("cents", round(col("l_extendedprice") * 100, 0).cast("long"))
      .withColumn("ship_day", datediff(col("ship_date"), lit("1992-01-01")).cast("long"))
    def rangeW(days: Int) = Window.partitionBy(col("l_partkey"))
      .orderBy(col("ship_day")).rangeBetween(-days, 0)
    val w7 = rangeW(7)
    val w30 = rangeW(30)
    val feat = l
      .withColumn("popularity_7d", count(lit(1)).over(w7).cast("long"))
      .withColumn("__n30", count(lit(1)).over(w30).cast("long"))
      .withColumn("__s30", sum(col("cents")).over(w30))
      // Σx² fits BIGINT: cents ≤ ~1e7, squared 1e14, × frame rows ≪ 9e18
      .withColumn("__ss30", sum((col("cents").cast("decimal(15,0)") * col("cents").cast("decimal(15,0)"))).over(w30).cast("long"))
      .withColumn("returns_7d", sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).over(w7))
    val n = col("__n30").cast("double")
    val s = col("__s30").cast("double")
    val ss = col("__ss30").cast("double")
    feat
      // price volatility: raw-moment sample stddev in cents → price units
      .withColumn("price_volatility_30d",
        when(col("__n30") <= 1, lit(null).cast("double"))
          .otherwise(sqrt((ss - (s * s) / n) / (n - 1)) / 100.0))
      .withColumn("return_rate_7d",
        col("returns_7d").cast("double") / col("popularity_7d").cast("double"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "ship_date",
        "l_extendedprice", "popularity_7d", "price_volatility_30d",
        "returns_7d", "return_rate_7d")
  }

  /** Weighted-rule anomaly composite over the event stream (reference
    * :952-990): per-user value z-score with the reference's 0.001 epsilon
    * denominator, volume and time-of-day rules, weights 0.4/0.3/0.2,
    * composite > 0.5 flags the event. User stats shuffle on the user key
    * (they scale with the table; never driver-side).
    *
    * Two reference rules are deliberately dropped (so the composite maxes at
    * 0.9, not 1.2): the negative-quantity volume branch (`quantity < -50`,
    * weight 0.3) — event values in this corpus are non-negative, so the
    * branch is dead here — and the `risk_score > 0.7` rule (weight 0.3),
    * whose input column has no corpus analog. A corpus with negative event
    * values should add the `value < -50` branch to both the operator and
    * its oracle. */
  def eventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"))
      .withColumn("hour_of_day", hour(col("ts")).cast("long"))
    // per-user mean/std from exact decimal sums (value magnitudes are far
    // below the 2^53·10^-6 decimal-cast divergence zone, SURVEY §3)
    val vDec = col("value").cast(Dec)
    val stats = e.groupBy(col("user_id").as("s_user"))
      .agg(countAll.as("n"), sum(vDec).as("sv"), sum(vDec * vDec).as("svv"))
    val nD = col("n").cast("double")
    val mean = col("sv").cast("double") / nD
    val variance = (col("svv").cast("double") - (col("sv").cast("double") * col("sv").cast("double")) / nD) / (nD - 1)
    val userStats = stats.select(
      col("s_user"),
      mean.as("user_mean"),
      when(col("n") <= 1, lit(0.0)).otherwise(sqrt(variance)).as("user_std"))
    e.join(userStats, e("user_id") === col("s_user")).drop("s_user")
      .withColumn("value_zscore",
        (col("value") - col("user_mean")) / (col("user_std") + lit(0.001)))
      .withColumn("is_value_anomaly", abs(col("value_zscore")) > 3.0)
      .withColumn("is_volume_anomaly", col("value") > 100.0)
      .withColumn("is_time_anomaly", col("hour_of_day") < 6 || col("hour_of_day") > 23)
      // weights summed in integer tenths (0.4+0.3+0.2 in binary doubles is
      // order-sensitive and DuckDB types those literals as DECIMAL anyway);
      // one exact int→double conversion at the end is portable
      .withColumn("__tenths",
        when(col("is_value_anomaly"), 4L).otherwise(0L) +
        when(col("is_volume_anomaly"), 3L).otherwise(0L) +
        when(col("is_time_anomaly"), 2L).otherwise(0L))
      .withColumn("anomaly_score", col("__tenths").cast("double") / 10.0)
      .withColumn("is_anomaly", col("__tenths") > 5)
      .select("event_id", "user_id", "event_type", "hour_of_day", "value",
        "value_zscore", "is_value_anomaly", "is_volume_anomaly",
        "is_time_anomaly", "anomaly_score", "is_anomaly")
  }
}
