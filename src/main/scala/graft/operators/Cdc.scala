package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply (reference: src/streaming/cdc_processor.py): collapse a
  * change stream of insert/update/delete operations to current state —
  * latest change per business key wins, keys whose latest change is a
  * delete disappear. One window shuffle on the key; the same code applies
  * per micro-batch under foreachBatch in streaming.
  */
object Cdc {

  /** Generic form: latest by `orderCols` per `keyCols`; drop rows whose
    * final op is `deleteOp`. */
  def applyChanges(changes: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[String], opCol: String,
                   deleteOp: String = "D"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .filter(col(opCol) =!= deleteOp)
  }

  /** Query form: orders as the change stream for customer order-state —
    * status O→insert, F→update, P→delete; sequence = (date, orderkey). */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.orders(spark, dir)
      .withColumn("op",
        when(col("o_orderstatus") === "O", "I")
          .when(col("o_orderstatus") === "F", "U")
          .otherwise("D"))
      .withColumn("change_date", to_date(col("o_orderdate")))
    applyChanges(changes, Seq("o_custkey"), Seq("change_date", "o_orderkey"), "op")
      .select(
        col("o_custkey").as("customer_id"), col("op").as("last_op"),
        col("o_orderkey").as("last_orderkey"), col("change_date").as("last_change_date"),
        col("o_totalprice").as("last_totalprice"), col("o_orderpriority").as("last_priority"))
  }
}
