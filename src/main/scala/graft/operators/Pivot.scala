package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pivot (reference: src/etl/transformations/dataframe_ops.py:266-279).
  * The pivot value list is the fixed priority enum — passing it explicitly
  * skips the extra distinct-values job Spark otherwise runs (one fewer full
  * scan at 100 TB).
  */
object Pivot {
  import Exact._

  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val aliases    = Seq("urgent", "high", "medium", "not_specified", "low")

  def revenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.ordersWithCountry(spark, dir)
    val pivoted = o.groupBy(col("country"))
      .pivot("o_orderpriority", priorities)
      .agg(decSum(col("o_totalprice")))
    val renamed = priorities.zip(aliases).foldLeft(pivoted) { case (df, (p, a)) =>
      df.withColumn(s"${a}_revenue", coalesce(dec6ToDouble(col(s"`$p`")), lit(0.0)))
        .drop(p)
    }
    renamed.withColumn("total_revenue",
      aliases.map(a => col(s"${a}_revenue")).reduce(_ + _))
  }
}
