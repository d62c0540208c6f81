package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/feature drift detection between a reference and a current data
  * window (reference: src/ml/monitoring/model_monitor.py:144-260,
  * FeatureDriftDetector — scipy ks_2samp and Jensen-Shannon divergence on
  * pandas Series; here both are distributed per-group computations).
  *
  * The KS statistic is pure rational arithmetic — cumulative counts divided
  * by group totals — so it is bit-deterministic and oracle-exact (SURVEY.md
  * §3). Jensen-Shannon needs `ln`, which is NOT bitwise-portable across
  * libm implementations (measured ~2e-4 mismatch rate vs DuckDB), so
  * `jsDrift` is a rows-only query covered by DriftSpec instead of a hash
  * oracle.
  */
object Drift {

  /** Reference window = orders before this date; current window = on/after.
    * Test data spans 1995-01-01..2001-08-01, so this splits roughly 60/40. */
  private val SplitDate = "1998-01-01"

  /** Exact two-sample Kolmogorov-Smirnov drift per country
    * (model_monitor.py:218: `stats.ks_2samp(ref, curr)`).
    *
    * D = max over observed values v of |ECDF_ref(v) − ECDF_cur(v)|, computed
    * from per-(country, value) counts and a cumulative window ordered by
    * value within each country — one shuffle to the (country, cents) grain,
    * one country-partitioned window, one final groupBy. No driver-side data.
    * Severity ladder mirrors model_monitor.py:247-256 (threshold 0.1, 1.5×,
    * 2× grades). */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.ordersWithCountry(spark, dir)
      .select(col("country"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        (col("o_orderdate") < lit(SplitDate)).as("is_ref"))
    val counts = oc.groupBy(col("country"), col("cents"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cnt_cur"))
    val w = Window.partitionBy(col("country")).orderBy(col("cents"))
    val wAll = Window.partitionBy(col("country"))
    val ecdf = counts
      .withColumn("cum_ref", sum(col("cnt_ref")).over(w))
      .withColumn("cum_cur", sum(col("cnt_cur")).over(w))
      .withColumn("n_ref", sum(col("cnt_ref")).over(wAll))
      .withColumn("n_cur", sum(col("cnt_cur")).over(wAll))
      .withColumn("ecdf_gap", abs(
        col("cum_ref").cast("double") / col("n_ref").cast("double") -
        col("cum_cur").cast("double") / col("n_cur").cast("double")))
    ecdf.groupBy(col("country"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        max(col("ecdf_gap")).as("ks_stat"))
      .withColumn("drift_detected", col("ks_stat") > 0.1)
      .withColumn("severity",
        when(col("ks_stat") > 0.2, "critical")
          .when(col("ks_stat") > 0.15, "high")
          .when(col("ks_stat") > 0.1, "medium")
          .otherwise("low"))
  }

  /** Jensen-Shannon drift per country (model_monitor.py:223-246): 50
    * equal-width bins over the combined [min, max], densities normalized to
    * probabilities with 1e-8 epsilon smoothing, JS distance = sqrt(JSD).
    * Rows-only (ln is not bitwise-portable); DriftSpec pins the math on a
    * hand-computed case and bounds: 0 ≤ js ≤ sqrt(ln 2), js(self)=0. */
  def jsDrift(spark: SparkSession, dir: String): DataFrame = {
    val bins = 50
    val oc = Tables.ordersWithCountry(spark, dir)
      .select(col("country"), col("o_totalprice").as("v"),
        (col("o_orderdate") < lit(SplitDate)).as("is_ref"))
    val extent = oc.groupBy(col("country").as("e_country"))
      .agg(min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    val binned = oc.join(broadcast(extent), oc("country") === extent("e_country"))
      .withColumn("bin",
        when(col("v_max") === col("v_min"), lit(0L)).otherwise(least(
          floor((col("v") - col("v_min")) / ((col("v_max") - col("v_min")) / bins)).cast("long"),
          lit(bins - 1L))))
      .groupBy(col("country"), col("bin"))
      .agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("cnt_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cnt_cur"))
    val wAll = Window.partitionBy(col("country"))
    val eps = lit(1e-8)
    val probs = binned
      .withColumn("p0", col("cnt_ref").cast("double") / sum(col("cnt_ref")).over(wAll).cast("double"))
      .withColumn("q0", col("cnt_cur").cast("double") / sum(col("cnt_cur")).over(wAll).cast("double"))
      // epsilon-smooth then renormalize, as the reference does
      .withColumn("p", (col("p0") + eps) / (lit(1.0) + eps * bins))
      .withColumn("q", (col("q0") + eps) / (lit(1.0) + eps * bins))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("kl_pm", col("p") * log(col("p") / col("m")))
      .withColumn("kl_qm", col("q") * log(col("q") / col("m")))
    probs.groupBy(col("country"))
      .agg(
        sum(col("cnt_ref")).as("n_ref"),
        sum(col("cnt_cur")).as("n_cur"),
        sqrt((sum(col("kl_pm")) + sum(col("kl_qm"))) / 2).as("js_distance"))
      .withColumn("drift_detected", col("js_distance") > 0.1)
  }
}
