package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic ML feature-preparation operators (reference:
  * src/analytics/core/feature_engineering.py — FeatureEngineer's
  * missing-value handlers :254-337, categorical encoders :298-356, and
  * scalers :275-431; sklearn on pandas there, declarative Spark here).
  *
  * Shapes: every "fit" statistic (mean, min/max, category codes) is a
  * constant-size aggregate broadcast back over the data — one pass to fit,
  * one codegen'd projection to transform, nothing driver-side. Means are
  * exact DECIMAL sums cast to double (SURVEY §3) so imputed/scaled values
  * are bit-identical to the DuckDB oracle.
  */
object FeatureEng {

  /** Mean-impute nulls in a numeric column: exact-decimal global mean,
    * broadcast, coalesce. */
  def imputeMean(df: DataFrame, c: String): DataFrame = {
    val m = df.agg((graft.Exact.dec6ToDouble(sum(col(c).cast("decimal(18,6)"))) /
      count(col(c)).cast("double")).as(s"__mean_$c"))
    df.crossJoin(broadcast(m))
      .withColumn(c, coalesce(col(c), col(s"__mean_$c")))
      .drop(s"__mean_$c")
  }

  /** Deterministic label encoding: codes follow the category sort order
    * (dense_rank over the DISTINCT values — a constant-size frame, so the
    * single-partition window is bounded by cardinality, not data). The
    * guard enforces that premise: nothing in the signature stops a caller
    * passing a KEY column (o_custkey would single-partition 150k×SF rows),
    * so past 10k distinct values the plan raises instead of degrading. */
  def labelEncode(df: DataFrame, c: String, out: String): DataFrame = {
    val codes = df.select(col(c)).distinct()
      .withColumn(out, RankOps.boundedFrame(s"label_encode($c)",
        dense_rank().over(Window.orderBy(col(c))).cast("long"), maxRows = 10000L))
    df.join(broadcast(codes), Seq(c), "left")
  }

  /** One-hot flags for an explicit category list (reference one-hot encoder;
    * explicit list keeps the output schema static, unknown values get all
    * zeros). */
  def oneHot(df: DataFrame, c: String, categories: Seq[String]): DataFrame =
    categories.foldLeft(df) { (d, v) =>
      d.withColumn(s"is_${v.toLowerCase}", (col(c) === v).cast("int"))
    }

  /** Min-max scale to [0,1]: exact min/max broadcast; constant columns → 0.5
    * (sklearn maps constants to 0; 0.5 is the midpoint — documented choice,
    * mirrored in the oracle). */
  def minMaxScale(df: DataFrame, c: String, out: String): DataFrame = {
    val mm = df.agg(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c"))
    df.crossJoin(broadcast(mm))
      .withColumn(out,
        when(col(s"__mx_$c") === col(s"__mn_$c"), lit(0.5))
          .otherwise((col(c) - col(s"__mn_$c")) / (col(s"__mx_$c") - col(s"__mn_$c"))))
      .drop(s"__mn_$c", s"__mx_$c")
  }

  /** Driver query: the customer feature matrix — synthetic missingness at
    * key%7=0 exercises imputation; label + one-hot encode the segment;
    * min-max scale the (imputed) balance. */
  def customerFeatures(spark: SparkSession, dir: String): DataFrame = {
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("acctbal"))
    val imputed = imputeMean(base, "acctbal")
    val encoded = oneHot(labelEncode(imputed, "c_mktsegment", "segment_code"),
      "c_mktsegment", segments)
    minMaxScale(encoded, "acctbal", "acctbal_scaled")
  }

  /** DuckDB oracle mirroring customerFeatures. */
  def customerFeaturesOracle: String = {
    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val hot = segments.map(v =>
      s"CAST(i.c_mktsegment = '$v' AS INTEGER) AS is_${v.toLowerCase}").mkString(",\n      |  ")
    s"""WITH base AS (
       |  SELECT c_custkey, c_mktsegment,
       |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS acctbal
       |  FROM customer
       |), m AS (
       |  SELECT ${graft.Exact.dec6ToDoubleSql("SUM(CAST(acctbal AS DECIMAL(18,6)))")}
       |         / CAST(COUNT(acctbal) AS DOUBLE) AS mean_b FROM base
       |), imp AS (
       |  SELECT c_custkey, c_mktsegment, coalesce(acctbal, mean_b) AS acctbal
       |  FROM base CROSS JOIN m
       |), codes AS (
       |  SELECT c_mktsegment, CAST(DENSE_RANK() OVER (ORDER BY c_mktsegment) AS BIGINT) AS segment_code
       |  FROM (SELECT DISTINCT c_mktsegment FROM base)
       |), mm AS (SELECT min(acctbal) AS mn, max(acctbal) AS mx FROM imp)
       |SELECT c_custkey, i.c_mktsegment AS c_mktsegment, acctbal, segment_code,
       |  $hot,
       |  CASE WHEN mx = mn THEN 0.5 ELSE (acctbal - mn) / (mx - mn) END AS acctbal_scaled
       |FROM imp i
       |LEFT JOIN codes ON i.c_mktsegment = codes.c_mktsegment
       |CROSS JOIN mm""".stripMargin
  }
}
