package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-dataset consistency validation (reference: src/data_quality/
  * validation/smart_validator.py:580-680, check_cross_dataset_consistency —
  * key-overlap census between two datasets plus field-level equality over
  * the common keys; the reference samples 1000 keys for performance, here the
  * full join is distributed so no sampling is needed).
  *
  * Applied to the orders ↔ lineitem-rollup pair: key overlap (orders with no
  * lines / lines with no order), stored-vs-recomputed total consistency, and
  * the ship-after-order temporal rule. One key-shuffle join at order grain;
  * every count is exact, rates are final-projection IEEE divisions.
  */
object CrossConsistency {
  import Exact._

  def crossConsistency(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val lt = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        decSum(col("l_extendedprice")).as("line_total"),
        min(col("l_shipdate")).as("first_ship"))
    val joined = o.join(lt, o("o_orderkey") === lt("l_orderkey"), "full_outer")

    val agg = joined.agg(
      sum(when(col("o_orderkey").isNotNull, 1L).otherwise(0L)).as("records_1"),
      sum(when(col("l_orderkey").isNotNull, 1L).otherwise(0L)).as("records_2"),
      sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull, 1L).otherwise(0L)).as("common_records"),
      sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNull, 1L).otherwise(0L)).as("only_1"),
      sum(when(col("o_orderkey").isNull && col("l_orderkey").isNotNull, 1L).otherwise(0L)).as("only_2"),
      // stored total vs recomputed line rollup, at cent precision
      sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull &&
        abs(col("o_totalprice") - col("line_total").cast("double")) >= 0.01, 1L).otherwise(0L))
        .as("total_mismatch"),
      // temporal rule: no line ships before its order date
      sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNotNull &&
        col("first_ship") < col("o_orderdate"), 1L).otherwise(0L))
        .as("ship_before_order"))

    def checkRow(id: String, inconsistent: Column, denom: Column) = Seq(
      lit(id).as("check_id"),
      lit("orders~lineitem").as("dataset_pair"),
      col("records_1"), col("records_2"), col("common_records"),
      col("only_1"), col("only_2"),
      inconsistent.as("inconsistent"),
      (lit(1.0) - inconsistent.cast("double") / denom.cast("double")).as("consistency_rate"),
      (inconsistent === 0).as("passed"))

    agg.select(checkRow("key_overlap", col("only_1") + col("only_2"),
        col("records_1") + col("records_2")): _*)
      .unionAll(agg.select(checkRow("total_consistency", col("total_mismatch"),
        col("common_records")): _*))
      .unionAll(agg.select(checkRow("ship_after_order", col("ship_before_order"),
        col("common_records")): _*))
  }
}
