package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver cleaning chain (reference: src/etl/silver/spark_silver.py:48-192):
  * cast/clean → business-rule filter → derived columns → window dedup →
  * completeness flags, mapped onto lineitem. All filters live at the top of
  * the plan so they push down into the parquet scan.
  */
object Silver {

  /** Business keys for the keep-one dedup
    * (reference: src/etl/silver/spark_silver.py:133). */
  private val dedupKeys = Seq("l_orderkey", "l_partkey")

  /** Business rules (reference: spark_silver.py:82-87), expressed through the
    * generic rule engine: positive quantity, non-negative price, key present.
    * filterValid keeps them raw conjuncts so Catalyst pushes them to the scan. */
  val businessRules: Seq[Validation.Rule] = Seq(
    Validation.Rule("positive_quantity", col("l_quantity") > 0),
    Validation.Rule("non_negative_price", col("l_extendedprice") >= 0),
    Validation.Rule("order_key_present", col("l_orderkey").isNotNull))

  def cleanLineitem(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)

    val valid = Validation.filterValid(l, businessRules)

    // Derived columns (reference: spark_silver.py:98-114).
    val derived = valid
      .withColumn("total_amount",
        col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
      .withColumn("ship_date", to_date(col("l_shipdate")))
      .withColumn("ship_year", year(col("ship_date")).cast("long"))
      .withColumn("ship_month", month(col("ship_date")).cast("long"))
      .withColumn("ship_quarter", quarter(col("ship_date")).cast("long"))
      .withColumn("ship_day_of_week", date_format(col("ship_date"), "EEEE"))

    // Keep-latest dedup per business key (reference: spark_silver.py:136-144)
    // — window partitioned by the key (scales), unique tie-breaker included.
    val w = Window.partitionBy(dedupKeys.map(col): _*)
      .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
    val deduped = derived
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    // Completeness score over the 7 business-critical fields
    // (reference: spark_silver.py:161-170).
    val requiredCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_shipdate", "l_returnflag")
    val nonNullCount = requiredCols
      .map(c => when(col(c).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    deduped
      .withColumn("completeness_score", nonNullCount.cast("double") / lit(7.0))
      .withColumn("is_high_quality", col("completeness_score") >= 0.8)
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"),
        col("total_amount"), col("ship_date"), col("ship_year"), col("ship_month"),
        col("ship_quarter"), col("ship_day_of_week"),
        col("completeness_score"), col("is_high_quality"))
  }
}
