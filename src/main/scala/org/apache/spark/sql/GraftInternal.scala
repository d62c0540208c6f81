package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into two `private[sql]` seams that custom logical plans
  * need (the standard extension-library idiom — e.g. how OSS geo/timeseries
  * Spark extensions construct DataFrames over injected plan nodes):
  *
  *  - `Dataset.ofRows`: wrap a hand-built LogicalPlan as a DataFrame;
  *  - `queryExecution.analyzed`: the resolved plan + output attributes of an
  *    input DataFrame, used to bind the custom node's expressions.
  */
object GraftInternal {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Optimized plan of a DataFrame (tests use this to assert optimizer rules
    * like AsOfColumnPruning actually fired). */
  def analyzedToOptimized(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.optimizedPlan
}
