package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML feature-pipeline transformers, re-expressed as declarative column
  * transforms (reference: src/ml/feature_engineering/feature_pipeline.py —
  * pandas fit/transform classes; here each is a single Catalyst projection or
  * one aggregate + broadcast join, so Tungsten codegen carries the whole map
  * side and nothing is driver-resident).
  *
  * Determinism notes (SURVEY.md §3): cyclical sin/cos features are emitted as
  * raw doubles deliberately — the argument set is *finite and fixed*
  * (2π·m/12 for m∈1..12, 2π·d/7 for d∈0..6) and all 19 values were verified
  * bitwise-identical between java.lang.Math and DuckDB's libm, unlike
  * data-dependent transcendentals which differ ~1.5e-4 of the time. The
  * expression shape ((2·π)·k)/denom is kept identical on both sides so
  * constant folding yields the same argument double.
  */
object FeaturePipeline {
  import Exact._

  /** Time-based features per order (reference: feature_pipeline.py:95-133,
    * TimeFeatureTransformer): calendar parts, pandas-convention weekday
    * (Monday=0), weekend flag, cyclical month/weekday encodings, and
    * days-since-corpus-max. The corpus max date is a 1-row aggregate
    * broadcast-joined back (never a global window). */
  def timeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
    val maxDate = o.agg(max(col("order_date")).as("__ref_date"))
    val twoPi = lit(2.0) * lit(math.Pi)
    o.crossJoin(broadcast(maxDate))
      .withColumn("order_year", year(col("order_date")).cast("long"))
      .withColumn("order_month", month(col("order_date")).cast("long"))
      .withColumn("order_day", dayofmonth(col("order_date")).cast("long"))
      .withColumn("order_weekday", weekday(col("order_date")).cast("long"))
      .withColumn("order_quarter", quarter(col("order_date")).cast("long"))
      .withColumn("is_weekend", col("order_weekday").isin(5L, 6L))
      .withColumn("month_sin", sin(twoPi * col("order_month") / lit(12.0)))
      .withColumn("month_cos", cos(twoPi * col("order_month") / lit(12.0)))
      .withColumn("weekday_sin", sin(twoPi * col("order_weekday") / lit(7.0)))
      .withColumn("weekday_cos", cos(twoPi * col("order_weekday") / lit(7.0)))
      .withColumn("days_since", datediff(col("__ref_date"), col("order_date")).cast("long"))
      .drop("__ref_date")
  }

  /** Group-statistic features mapped back to rows plus ratio-to-group-mean
    * (reference: feature_pipeline.py:148-188, AggregationFeatureTransformer:
    * groupby().agg() then .map() back onto each row, ratio with a 1e-8
    * epsilon). Group = customer country (25 groups — broadcast join back);
    * the mean is exact-decimal-sum / exact-count so the mapped feature is
    * bit-deterministic. */
  def groupRatioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.ordersWithCountry(spark, dir)
      .select(col("o_orderkey"), col("country"), col("o_totalprice"))
    val stats = o.groupBy(col("country").as("g_country"))
      .agg(
        (decSumDbl(col("o_totalprice")) / countAll.cast("double")).as("country_mean_totalprice"),
        max(col("o_totalprice")).as("country_max_totalprice"),
        countAll.as("country_orders"))
    o.join(broadcast(stats), o("country") === stats("g_country")).drop("g_country")
      .withColumn("price_to_country_mean_ratio",
        col("o_totalprice") / (col("country_mean_totalprice") + lit(1e-8)))
      .withColumn("price_to_country_max_ratio",
        col("o_totalprice") / (col("country_max_totalprice") + lit(1e-8)))
  }

  /** Lagged supervised-learning matrix over the per-country daily revenue
    * series (reference: src/ml/analytics/predictive_engine.py:379-387,
    * _create_lagged_features: X = [t-lags..t-1], y = t, emitted only once a
    * full lag window exists). Positional lags over present days, exactly as
    * the reference's series indexing; the window partitions by country so
    * nothing global-sorts. */
  def laggedFeatures(spark: SparkSession, dir: String, lags: Int = 7): DataFrame = {
    val daily = Tables.ordersWithCountry(spark, dir)
      .groupBy(col("country"), col("o_orderdate").cast("date").as("day"))
      .agg(decSumDbl(col("o_totalprice")).as("target"))
    val w = Window.partitionBy(col("country")).orderBy(col("day"))
    // one select, not a per-lag withColumn foldLeft (each withColumn
    // re-analyzes the whole plan — optimization r17, guide §7.3)
    val lagged = daily.select(col("*") +: (1 to lags).map(k =>
      lag(col("target"), k).over(w).as(s"lag_$k")): _*)
    lagged.filter(col(s"lag_$lags").isNotNull)
  }

  /** Degree-2 multiplicative interaction features over the lineitem numeric
    * columns (reference: feature_pipeline.py:200-228,
    * InteractionFeatureTransformer: itertools.combinations then row-wise
    * prod). Pure projection — IEEE multiplication is exactly rounded, so
    * engine-portable; whole-stage codegen carries it with zero shuffles. */
  def interactionFeatures(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // one select, not a per-pair withColumn foldLeft (guide §7.3)
    l.select(col("*") +: cols.combinations(2).toSeq.map { case Seq(a, b) =>
      (col(a) * col(b)).as(s"${a.stripPrefix("l_")}_x_${b.stripPrefix("l_")}")
    }: _*)
  }
}
