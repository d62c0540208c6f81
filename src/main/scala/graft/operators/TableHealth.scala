package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-health report: the reference's dbt data-quality test macros
  * (reference: dbt/macros/data_quality_checks.sql — test_data_freshness:1,
  * test_row_count_anomaly:7, test_revenue_anomaly:37, test_null_percentage:67,
  * test_duplicate_records:76, test_temporal_consistency:248) folded into one
  * long-format report, one row per (table, check).
  *
  * `current_date` in the macros is replaced by each table's own max date
  * ("as-of") so the report is deterministic on a frozen corpus. Every check
  * is a small global aggregate (map-side partial, one row out) or a keyed
  * duplicate count; variance percentages are exact-count/exact-decimal-sum
  * ratios computed in the final projection (SURVEY.md §3).
  */
object TableHealth {
  import Exact._

  private def checkRow(table: String, check: String, observed: Column,
                       expected: Column, variancePct: Column, passed: Column) =
    Seq(lit(table).as("table_name"), lit(check).as("check_name"),
      observed.cast("double").as("observed"), expected.cast("double").as("expected"),
      variancePct.cast("double").as("variance_pct"), passed.as("passed"))

  /** One row per check: orders row-count + revenue anomaly vs the trailing
    * 30-day daily average (macro thresholds 50% / 30%), orders temporal
    * consistency (missing grain days over the full span), lineitem duplicate
    * business keys, customer null percentage, events freshness (rows inside
    * the trailing 24 h of the table's own as-of). */
  def tableHealth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderdate").cast("date").as("d"), col("o_totalprice"))

    // daily orders grain: count + exact revenue per day, as-of = max day
    val daily = o.groupBy(col("d"))
      .agg(countAll.as("cnt"), decSum(col("o_totalprice")).as("rev"))
    val asof = daily.agg(max(col("d")).as("asof"))
    val flagged = daily.crossJoin(broadcast(asof))
      .withColumn("is_last", col("d") === col("asof"))
      .withColumn("is_hist", col("d") >= date_sub(col("asof"), 31) && col("d") <= date_sub(col("asof"), 2))

    // row_count_anomaly (macro :7): |last-day count − 30d avg| / avg · 100 > 50
    val rowCounts = flagged.agg(
      sum(when(col("is_last"), col("cnt")).otherwise(0L)).as("last_cnt"),
      sum(when(col("is_hist"), col("cnt")).otherwise(0L)).as("hist_cnt"),
      sum(when(col("is_hist"), 1L).otherwise(0L)).as("hist_days"),
      sum(when(col("is_last"), col("rev")).otherwise(lit(0).cast(Dec))).as("last_rev"),
      sum(when(col("is_hist"), col("rev")).otherwise(lit(0).cast(Dec))).as("hist_rev"),
      // temporal_consistency inputs (macro :248): distinct days vs span
      (datediff(max(col("d")), min(col("d"))) + 1).cast("long").as("span_days"),
      countAll.as("present_days"))

    val avgCnt = col("hist_cnt").cast("double") / col("hist_days").cast("double")
    val avgRev = Exact.dec6ToDouble(col("hist_rev")) / col("hist_days").cast("double")
    val cntVar = abs(col("last_cnt").cast("double") - avgCnt) / avgCnt * 100
    val revVar = abs(Exact.dec6ToDouble(col("last_rev")) - avgRev) / avgRev * 100
    val missing = (col("span_days") - col("present_days")).cast("double")
    val completeness = col("present_days").cast("double") / col("span_days").cast("double") * 100

    val ordersChecks =
      rowCounts.select(checkRow("orders", "row_count_anomaly",
        col("last_cnt"), avgCnt, cntVar, cntVar <= 50): _*)
      .unionAll(rowCounts.select(checkRow("orders", "revenue_anomaly",
        Exact.dec6ToDouble(col("last_rev")), avgRev, revVar, revVar <= 30): _*))
      .unionAll(rowCounts.select(checkRow("orders", "temporal_consistency",
        missing, col("span_days"), completeness, missing === 0): _*))

    // duplicate_records (macro :76): lineitem business key (orderkey, linenumber)
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber"))
    val dups = l.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(countAll.as("k"))
      .agg(sum(when(col("k") > 1, 1L).otherwise(0L)).as("dup_keys"), countAll.as("total_keys"))
    val dupChecks = dups.select(checkRow("lineitem", "duplicate_records",
      col("dup_keys"), lit(0), col("dup_keys").cast("double") / col("total_keys").cast("double") * 100,
      col("dup_keys") === 0): _*)

    // null_percentage (macro :67) on customer.c_mktsegment, threshold 5%
    val c = Tables.customer(spark, dir)
    val nulls = c.agg(
      sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as("null_rows"),
      countAll.as("total_rows"))
    val nullPct = col("null_rows").cast("double") / col("total_rows").cast("double") * 100
    val nullChecks = nulls.select(checkRow("customer", "null_percentage",
      col("null_rows"), lit(0), nullPct, nullPct <= 5): _*)

    // data_freshness (macro :1): rows older than as-of − 24 h are "stale";
    // the table is fresh when at least one row is inside the window
    val e = Tables.events(spark, dir).select(col("ts"))
    val eAsof = e.agg(max(col("ts")).as("e_asof"))
    val fresh = e.crossJoin(broadcast(eAsof))
      .agg(
        sum(when(col("ts") < col("e_asof") - expr("INTERVAL 24 HOURS"), 1L).otherwise(0L)).as("stale_rows"),
        countAll.as("total_rows"))
    val freshChecks = fresh.select(checkRow("events", "data_freshness",
      col("stale_rows"), col("total_rows"),
      col("stale_rows").cast("double") / col("total_rows").cast("double") * 100,
      col("total_rows") > col("stale_rows")): _*)

    ordersChecks.unionAll(dupChecks).unionAll(nullChecks).unionAll(freshChecks)
  }
}
