package graft.operators

import graft.{Exact, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-retention policy evaluation (reference: dbt/macros/data_retention.sql
  * — archive/restore flow keyed on row age vs a retention window; the
  * restore macro's `archived_at` partitioning is re-expressed here as the
  * age-band classification a retention sweep would evaluate before moving
  * rows).
  *
  * As-of is the corpus max order date (deterministic on a frozen corpus).
  * One groupBy over the banded age — the band expression stays in the scan
  * projection so the single shuffle is on the 3-value band key with map-side
  * partial aggregation; at 100 TB the same plan holds (the band key is
  * low-cardinality but the partial aggregation collapses each partition to
  * ≤3 rows before the exchange).
  */
object Retention {
  import Exact._

  /** Age bands: active ≤ 730 days, archive 731–1825, purge > 1825 (the
    * macro family's retain-2y / archive-5y defaults). Reports per band:
    * row count, exact revenue, date span, and share of rows. */
  def retentionPolicy(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderdate").cast("date").as("d"), col("o_totalprice"))
    val asof = o.agg(max(col("d")).as("asof"))
    val banded = o.crossJoin(broadcast(asof))
      .withColumn("age_days", datediff(col("asof"), col("d")).cast("long"))
      .withColumn("retention_band",
        when(col("age_days") <= 730, "active")
          .when(col("age_days") <= 1825, "archive")
          .otherwise("purge"))
    val total = banded.groupBy(col("retention_band"))
      .agg(
        countAll.as("row_count"),
        decSumDbl(col("o_totalprice")).as("revenue"),
        min(col("d")).as("oldest_date"),
        max(col("d")).as("newest_date"),
        min(col("age_days")).as("min_age_days"),
        max(col("age_days")).as("max_age_days"))
    val grand = total.agg(sum(col("row_count")).as("grand_total"))
    total.crossJoin(broadcast(grand))
      .withColumn("pct_of_rows",
        col("row_count").cast("double") / col("grand_total").cast("double") * 100)
      .drop("grand_total")
  }
}
