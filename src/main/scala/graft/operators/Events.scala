package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analogs of the reference's streaming aggregations
  * (reference: src/streaming/spark_structured_streaming.py,
  * stream_aggregations.py). The true Structured Streaming versions of both —
  * watermarked tumbling windows and stateful sessionization — live in
  * graft.streaming.StreamOps; these batch forms are the oracle-checkable
  * semantics.
  *
  * Timestamps are emitted as second-precision strings: the events table is
  * ns-precision parquet, and µs-vs-ns / tz-annotation differences between
  * engines make raw timestamp output un-comparable (SURVEY.md §3).
  */
object Events {
  import Exact._

  /** Tumbling 1-hour windows per event type. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(
        countAll.as("events_count"),
        countDistinct(col("user_id")).as("unique_users"),
        decSum(col("value")).as("__v"))
      .withColumn("total_value", dec6ToDouble(col("__v")))
      .withColumn("avg_value", dec6ToDouble(col("__v")) / col("events_count"))
      .drop("__v")
  }

  /** Semi-structured extraction: parse the events' JSON `props` payload and
    * aggregate the extracted field per event type (reference streams carry
    * JSON payloads through from_json/get_json_object —
    * spark_structured_streaming.py imports exactly these). */
  def jsonStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    e.groupBy(col("event_type"))
      .agg(
        countAll.as("n_events"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .withColumn("k_avg", col("k_sum").cast("double") / col("n_events"))
  }

  /** Gap-based sessionization (30-minute inactivity), batch form: a lag/
    * cumulative-sum session id per user, then per-session rollup. Windows are
    * partitioned by user_id — high cardinality, scales. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSeconds = unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))
    val isNew = when(lag(col("ts"), 1).over(w).isNull || gapSeconds > 1800, 1L).otherwise(0L)
    e.withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).cast("long")
          .as("duration_seconds"),
        countAll.as("n_events"),
        countDistinct(col("event_type")).as("distinct_event_types"),
        decSumDbl(col("value")).as("total_value"))
  }
}
