package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B experiment evaluation over the event stream (reference:
  * src/api/v1/routes/ml_analytics.py:1429-1500 `get_ab_experiment_results` —
  * the API's result contract: per-metric control/treatment values, lift,
  * relative improvement, significance, and a deploy/keep/inconclusive
  * decision with a confidence grade; the reference returns mocked numbers,
  * the statistics here are real).
  *
  * Assignment is deterministic hash bucketing (user_id parity — the standard
  * split that replays identically), so the whole evaluation is reproducible.
  * Two metrics ship: a two-proportion z-test on purchase conversion and a
  * Welch z-test on mean event value. Significance compares |z| against the
  * normal critical values (1.96 / 2.576) rather than a p-value — erf/Φ are
  * not bit-reproducible across engines, the decision contract is identical.
  *
  * Scale shape: ONE aggregate pass over events (variant is a projection, the
  * rollup is two rows), then a 2×2 driver-free pivot via conditional
  * aggregation — no joins, no windows, constant-size intermediate at any SF.
  */
object Experiment {

  private val z95 = 1.959963984540054
  private val z99 = 2.5758293035489004

  def abTestResults(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      (col("user_id") % 2 === 1).as("treated"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("converted"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    def side(t: Boolean, c: Column): Column = sum(when(col("treated") === t, c))
    val agg = e.agg(
      side(false, lit(1L)).cast("long").as("n_c"),
      side(true, lit(1L)).cast("long").as("n_t"),
      side(false, col("converted")).cast("long").as("conv_c"),
      side(true, col("converted")).cast("long").as("conv_t"),
      side(false, col("cents")).cast("long").as("s_c"),
      side(true, col("cents")).cast("long").as("s_t"),
      side(false, col("cents").cast("decimal(19,0)") * col("cents").cast("decimal(19,0)"))
        .as("q_c"),
      side(true, col("cents").cast("decimal(19,0)") * col("cents").cast("decimal(19,0)"))
        .as("q_t"))
    def d(c: String): Column = col(c).cast("double")

    // metric 1: conversion rate — pooled two-proportion z
    val pc = d("conv_c") / d("n_c")
    val pt = d("conv_t") / d("n_t")
    val pPool = (d("conv_c") + d("conv_t")) / (d("n_c") + d("n_t"))
    val zProp = (pt - pc) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / d("n_c") + lit(1.0) / d("n_t")))

    // metric 2: mean event value — Welch z from exact sums (sample variances)
    val mc = d("s_c") / 100.0 / d("n_c")
    val mt = d("s_t") / 100.0 / d("n_t")
    val vc = (graft.Exact.bigDecToDouble(col("q_c")) - (d("s_c") * d("s_c")) / d("n_c")) / (d("n_c") - lit(1.0)) / lit(10000.0)
    val vt = (graft.Exact.bigDecToDouble(col("q_t")) - (d("s_t") * d("s_t")) / d("n_t")) / (d("n_t") - lit(1.0)) / lit(10000.0)
    val zMean = (mt - mc) / sqrt(vc / d("n_c") + vt / d("n_t"))

    def metric(name: String, cv: Column, tv: Column, z: Column): Column = {
      val lift = tv - cv
      val sig = abs(z) > z95
      struct(
        lit(name).as("metric_name"),
        cv.as("control_value"), tv.as("treatment_value"),
        lift.as("lift"),
        when(cv === 0.0, lit(null).cast("double"))
          .otherwise(lift / cv * lit(100.0)).as("relative_improvement_pct"),
        z.as("z_stat"), sig.as("statistical_significance"),
        when(sig && lift > 0.0, "deploy_treatment")
          .when(sig && lift < 0.0, "keep_control")
          .otherwise("inconclusive").as("decision"),
        when(abs(z) > z99, "high").when(sig, "medium").otherwise("low").as("confidence"))
    }
    agg.select(col("n_c").as("control_samples"), col("n_t").as("treatment_samples"),
        explode(array(
          metric("conversion_rate", pc, pt, zProp),
          metric("avg_event_value", mc, mt, zMean))).as("m"))
      .select(col("m.metric_name"), col("control_samples"), col("treatment_samples"),
        col("m.control_value"), col("m.treatment_value"), col("m.lift"),
        col("m.relative_improvement_pct"), col("m.z_stat"),
        col("m.statistical_significance"), col("m.decision"), col("m.confidence"))
  }

  def abTestResultsOracle: String =
    s"""WITH e AS (
      |  SELECT (user_id % 2 = 1) AS treated,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), a AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN NOT treated THEN 1 END) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN treated THEN 1 END) AS BIGINT) AS n_t,
      |    CAST(SUM(CASE WHEN NOT treated THEN converted END) AS BIGINT) AS conv_c,
      |    CAST(SUM(CASE WHEN treated THEN converted END) AS BIGINT) AS conv_t,
      |    CAST(SUM(CASE WHEN NOT treated THEN cents END) AS BIGINT) AS s_c,
      |    CAST(SUM(CASE WHEN treated THEN cents END) AS BIGINT) AS s_t,
      |    SUM(CASE WHEN NOT treated THEN CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)) END) AS q_c,
      |    SUM(CASE WHEN treated THEN CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)) END) AS q_t
      |  FROM e
      |), p AS (
      |  SELECT *,
      |    CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS pc,
      |    CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS pt,
      |    (CAST(conv_c AS DOUBLE) + CAST(conv_t AS DOUBLE)) / (CAST(n_c AS DOUBLE) + CAST(n_t AS DOUBLE)) AS pp,
      |    CAST(s_c AS DOUBLE) / 100.0 / CAST(n_c AS DOUBLE) AS mc,
      |    CAST(s_t AS DOUBLE) / 100.0 / CAST(n_t AS DOUBLE) AS mt,
      |    (${graft.Exact.bigDecToDoubleSql("q_c")} - (CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)) / CAST(n_c AS DOUBLE))
      |      / (CAST(n_c AS DOUBLE) - 1.0) / 10000.0 AS vc,
      |    (${graft.Exact.bigDecToDoubleSql("q_t")} - (CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)) / CAST(n_t AS DOUBLE))
      |      / (CAST(n_t AS DOUBLE) - 1.0) / 10000.0 AS vt
      |  FROM a
      |), z AS (
      |  SELECT *,
      |    (pt - pc) / sqrt(pp * (1.0 - pp) * (1.0 / CAST(n_c AS DOUBLE) + 1.0 / CAST(n_t AS DOUBLE))) AS z_prop,
      |    (mt - mc) / sqrt(vc / CAST(n_c AS DOUBLE) + vt / CAST(n_t AS DOUBLE)) AS z_mean
      |  FROM p
      |), m AS (
      |  SELECT 'conversion_rate' AS metric_name, n_c AS control_samples, n_t AS treatment_samples,
      |    pc AS control_value, pt AS treatment_value, pt - pc AS lift,
      |    CASE WHEN pc = 0.0 THEN NULL ELSE (pt - pc) / pc * 100.0 END AS relative_improvement_pct,
      |    z_prop AS z_stat FROM z
      |  UNION ALL
      |  SELECT 'avg_event_value', n_c, n_t, mc, mt, mt - mc,
      |    CASE WHEN mc = 0.0 THEN NULL ELSE (mt - mc) / mc * 100.0 END,
      |    z_mean FROM z
      |)
      |SELECT metric_name, control_samples, treatment_samples, control_value,
      |  treatment_value, lift, relative_improvement_pct, z_stat,
      |  abs(z_stat) > 1.959963984540054 AS statistical_significance,
      |  CASE WHEN abs(z_stat) > 1.959963984540054 AND lift > 0.0 THEN 'deploy_treatment'
      |       WHEN abs(z_stat) > 1.959963984540054 AND lift < 0.0 THEN 'keep_control'
      |       ELSE 'inconclusive' END AS decision,
      |  CASE WHEN abs(z_stat) > 2.5758293035489004 THEN 'high'
      |       WHEN abs(z_stat) > 1.959963984540054 THEN 'medium'
      |       ELSE 'low' END AS confidence
      |FROM m""".stripMargin
}
