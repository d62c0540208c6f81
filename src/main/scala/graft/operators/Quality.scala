package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling and outlier detection
  * (reference: src/etl/silver/spark_silver.py:156-253,
  * src/data_quality/core/profiler.py, and the z-score anomaly features in
  * src/etl/transformations/advanced_features.py:273).
  */
object Quality {
  import Exact._

  /** One-row profile of `orders`: null counts, distincts, numeric stats.
    * The reference loops a `count()` per column
    * (spark_silver.py:203-206) — one pass per column over the whole table;
    * here it is a single aggregate pass (one job at any scale). */
  def dqProfileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val nullCounts = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    val nonNullTotal = cols.map(c => count(col(c))).reduce(_ + _)
    val aggs = nullCounts ++ Seq(
      countDistinct(col("o_custkey")).as("distinct_customers"),
      countDistinct(col("o_orderstatus")).as("distinct_statuses"),
      min(col("o_totalprice")).as("min_totalprice"),
      max(col("o_totalprice")).as("max_totalprice"),
      decSum(col("o_totalprice")).as("__sum"),
      nonNullTotal.cast("long").as("__nonnull"))
    o.agg(countAll.as("total_records"), aggs: _*)
      .withColumn("avg_totalprice", col("__sum").cast("double") / col("total_records"))
      .withColumn("completeness",
        col("__nonnull").cast("double") / (col("total_records") * lit(cols.length)))
      .drop("__sum", "__nonnull")
  }

  /** Per-country z-score outliers on order totals. Mean/stddev come from
    * exact decimal sums (sum, sum-of-squares) so z is bit-deterministic; the
    * tiny per-country stats frame is broadcast back onto the fact. The
    * reference collects global mean/std to the driver
    * (spark_silver.py:174-188) — same idea, but here it stays a broadcast
    * join and is grouped per country. */
  def anomalyOrders(spark: SparkSession, dir: String): DataFrame = {
    // Variance in exact integer cents (order totals are 2dp) with the
    // shifted-data formula Var = [Σd² - (Σd)²/n]/(n-1), d = cents - S div n.
    // Everything up to the final projection is exact integer/decimal
    // arithmetic; the projection is a fixed sequence of single IEEE ops, so
    // both engines produce identical bits. (Casting computed doubles like
    // (x-mean)² to decimals is NOT parity-safe: DuckDB scales via a double
    // multiply, which diverges from Spark's exact conversion once |v|·10^s
    // approaches 2^53.)
    val o = Tables.ordersWithCountry(spark, dir)
      .select(col("o_orderkey"), col("country"), col("o_totalprice"))
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
    val agg1 = o.groupBy(col("country").as("a_country"))
      .agg(countAll.as("n"), sum(col("cents")).as("s"))
      .withColumn("center", expr("s div n"))
    val d15 = (col("cents") - col("center")).cast("decimal(15,0)")
    val agg2 = o.join(broadcast(agg1), col("country") === col("a_country"))
      .groupBy(col("a_country").as("s_country"), col("n"), col("s"), col("center"))
      .agg(sum(d15 * d15).as("ssd"))
    val tD = (col("s") % col("n")).cast("double") // Σd = S mod n, < n so exact
    // ssd fits BIGINT up to ~9e18 cents² — ample below ~1e8 rows per group;
    // beyond that widen the split (SURVEY §3).
    val ssdD = col("ssd").cast("long").cast("double")
    val stats = agg2.select(
      col("s_country"),
      ((col("s").cast("double") / col("n")) / lit(100.0)).as("mean_price"),
      (sqrt((ssdD - (tD * tD) / col("n")) / (col("n") - 1)) / lit(100.0)).as("std_price"))
    o.join(broadcast(stats), o("country") === stats("s_country"))
      .withColumn("z", (col("o_totalprice") - col("mean_price")) / col("std_price"))
      .withColumn("is_outlier", abs(col("z")) > 3.0)
      .select("o_orderkey", "country", "o_totalprice", "mean_price", "std_price", "z", "is_outlier")
  }
}
