package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 validity windows + hash change detection
  * (reference: src/etl/transformations/windowing.py:94-108 and scd2.py:24).
  *
  * Orders act as the customer-attribute change stream: each order is a
  * "version" of the customer's (status, priority) attributes. Windows are
  * partitioned by the business key — never a global sort — and ordered with a
  * unique tie-breaker. The attribute hash is md5 (identical on Spark and
  * DuckDB) rather than Spark-internal `hash` which the reference uses
  * (windowing.py:376-379) and which nothing else can reproduce.
  */
object Scd2 {

  def scd2Customer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("customer_id")).orderBy(col("valid_from"), col("o_orderkey"))
    val wDesc = Window.partitionBy(col("customer_id")).orderBy(col("valid_from").desc, col("o_orderkey").desc)
    o.select(
        col("o_custkey").as("customer_id"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("valid_from"),
        md5(concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))).as("attribute_hash"))
      .withColumn("prev_hash", lag(col("attribute_hash"), 1).over(w))
      .withColumn("next_valid_from", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", row_number().over(wDesc) === 1)
      .withColumn("valid_to",
        when(col("is_current"), lit(null).cast("date")).otherwise(col("next_valid_from")))
      .withColumn("change_type",
        when(col("prev_hash").isNull, "insert")
          .when(col("prev_hash") =!= col("attribute_hash"), "update")
          .otherwise("no_change"))
      .drop("next_valid_from")
  }
}
