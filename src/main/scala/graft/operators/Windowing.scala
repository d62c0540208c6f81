package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Running totals, lag/lead, rank/percent_rank
  * (reference: src/etl/transformations/windowing.py:111-272). All windows are
  * partitioned by customer — a high-cardinality key, so this scales — and the
  * running sum is exact-decimal so accumulation order cannot change the bits.
  */
object Windowing {
  import Exact._

  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("order_date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_date"), col("o_orderkey"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    o.withColumn("running_total",
        sum(col("o_totalprice").cast(Exact.Dec)).over(wCum).cast("double"))
      .withColumn("order_seq", row_number().over(w).cast("long"))
      .withColumn("prev_amount", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_amount", lead(col("o_totalprice"), 1).over(w))
      .withColumn("days_since_prev",
        datediff(col("order_date"), lag(col("order_date"), 1).over(w)).cast("long"))
      // ties collapse identically on both engines, so no tie-breaker needed
      .withColumn("amount_rank", dense_rank().over(wRank).cast("long"))
      .withColumn("amount_pct", percent_rank().over(wRank))
  }
}
