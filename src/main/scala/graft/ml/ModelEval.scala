package graft.ml

import graft.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised model training + evaluation (reference:
  * src/ml/training/model_trainer.py — fits RandomForest/GBT regressors over
  * an engineered feature matrix with a held-out split and reports
  * RMSE/MAE/R²).
  *
  * Spark-native shape: the feature matrix is the existing
  * `lagged_features` supervised matrix (per-country daily revenue with
  * lag_1..lag_7 predictors — the reference's own predictive-engine input),
  * the split is the repo's deterministic md5-bucket recipe over the stable
  * (country, day) grain — NOT randomSplit, whose assignment depends on
  * partitioning — and the model is [[DetGbt]]: deterministic histogram
  * boosting (depth-2 trees over equal-width bins of the exact cent
  * features, learning lag-pair interactions the round-10 stumps could
  * not). A naive lag-1 persistence baseline is evaluated on the
  * identical splits so the report carries its own control — the
  * reference's trainer logs a baseline comparison the same way
  * (model_trainer.py's metrics dict).
  *
  * Round 10 swapped MLlib's GBTRegressor for DetGbt, which flipped this —
  * the LAST rows-only query — to oracle-hash-exact: MLlib's quantile-sketch
  * split candidates are partition-order-dependent; DetGbt's equal-width
  * candidates, cent-rounded residual sums, and fixed stump count replay in
  * SQL end-to-end. Metrics are exact too: errors quantize to cents
  * (round half-away both engines), squared/absolute error sums are exact
  * decimal/long arithmetic, and R² uses the exact population variance of
  * the cent targets (the n·Σy²−(Σy)² form — all intermediates bounded
  * within DECIMAL(38)). The determinism price — cent-resolution errors —
  * is documented; the learning-quality gates (train R² beats naive
  * persistence; depth 2 beats the depth-1 stump fit) live in
  * ModelEvalSpec.
  *
  * Scale shape: the matrix grain is country×day (calendar-bounded at any
  * corpus size); the fit is one bounded collect of the train rows plus a
  * driver boosting loop (see DetGbt.fit — bit-identical to the former
  * 2·`Trees` treeAggregate passes, without their job-scheduling floor);
  * scoring is a literal-parameter projection; metrics are one partial-agg
  * groupBy. Driver state: the train matrix (grain-bounded) + stump list.
  */
object ModelEval {
  import Exact._

  val Trees = 30
  val Bins = 32
  val Lr = 0.1
  val Depth = 2

  private val LagCols = (1 to 7).map(k => s"lag_$k")
  private val XCols = (0 until 7).map(i => s"x$i")

  /** The supervised matrix + deterministic split + predictions from both
    * models (gbt = DetGbt, naive = lag-1 persistence). */
  def scoredMatrix(spark: SparkSession, dir: String,
                   depth: Int = Depth): DataFrame = {
    val base = graft.operators.FeaturePipeline.laggedFeatures(spark, dir)
      // md5 split on the stable series grain: reproducible on any engine /
      // partitioning, the hash_split recipe (TrainPrep.scala:37)
      .withColumn("__bucket",
        conv(substring(md5(concat_ws("|", col("country"), col("day").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("split", when(col("__bucket") < 80, "train").otherwise("test"))
      .withColumn("cents", round(col("target") * 100, 0).cast("long"))
    // one select, not a per-feature withColumn foldLeft (guide §7.3);
    // the fit is one bounded collect (DetGbt.fit) — no persist needed
    val matrix = base.select(col("*") +: LagCols.zipWithIndex.map { case (l, i) =>
      round(col(l) * 100, 0).cast("long").as(s"x$i") }: _*)
    val model = DetGbt.fit(matrix, "cents", XCols,
      col("split") === "train", Bins, Trees, Lr, depth)
    matrix
      .withColumn("prediction", DetGbt.predictExpr(model, XCols) / lit(100.0))
      .withColumn("naive", col("lag_1"))
      .drop("__bucket" +: "cents" +: XCols: _*)
  }

  /** 4-row metric report: (model × split) → n, rmse, mae, r2 — exact-sum
    * metrics over cent-quantized errors (see the class doc). */
  def modelEval(spark: SparkSession, dir: String): DataFrame = {
    val scored = scoredMatrix(spark, dir)
    def eq(p: org.apache.spark.sql.Column) =
      round((p - col("target")) * 100, 0).cast("long")
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val e = scored.select(
      col("split"),
      eq(col("prediction")).as("eg"),
      eq(col("naive")).as("en"),
      round(col("target") * 100, 0).cast("long").as("cy"))
    val a = e.groupBy("split").agg(
      countAll.as("n"),
      sum(d19(col("eg")) * d19(col("eg"))).as("sg2"),
      sum(abs(col("eg"))).as("sga"),
      sum(d19(col("en")) * d19(col("en"))).as("sn2"),
      sum(abs(col("en"))).as("sna"),
      sum(col("cy").cast("decimal(38,0)")).as("scy"),
      sum(d19(col("cy")) * d19(col("cy"))).as("scy2"))
    // exact population variance numerator: n·Σy² − (Σy)² — every
    // intermediate ≤ ~1e28 at calendar-bounded matrix sizes, well inside
    // DECIMAL(38); converted portably once
    val m = (col("n").cast("decimal(38,0)") * col("scy2") - col("scy") * col("scy"))
      .cast("decimal(38,0)")
    val nd = col("n").cast("double")
    val varC = bigDecToDouble(m) / (nd * nd)
    def metrics(s2: String, sa: String) = struct(
      sqrt(bigDecToDouble(col(s2)) / nd) / lit(100.0) as "rmse",
      (col(sa).cast("double") / nd) / lit(100.0) as "mae",
      lit(1.0) - (bigDecToDouble(col(s2)) / nd) / varC as "r2")
    a.select(
        expr("stack(2, 'gbt', 0, 'naive_lag1', 1) AS (model, __which)"),
        col("split"), col("n"),
        metrics("sg2", "sga").as("__mg"), metrics("sn2", "sna").as("__mn"))
      .withColumn("__m", when(col("__which") === 0, col("__mg")).otherwise(col("__mn")))
      .select(col("model"), col("split"), col("n"),
        col("__m.rmse").as("rmse"), col("__m.mae").as("mae"), col("__m.r2").as("r2"))
  }

  /** DuckDB oracle replaying the whole pipeline: lagged matrix, md5 split,
    * the DetGbt CTE chain, and the exact-sum metric tail. */
  def modelEvalOracle: String = {
    val lagSelects = (1 to 7).map(k =>
      s"LAG(target, $k) OVER (PARTITION BY country ORDER BY day) AS lag_$k").mkString(",\n    ")
    val xCols = (1 to 7).map(k =>
      s"CAST(round(lag_$k * 100) AS BIGINT) AS x${k - 1}").mkString(", ")
    val bucket =
      """CAST(list_sum(list_transform(range(1, 5), j ->
        |      (strpos('0123456789abcdef',
        |         substring(md5(country || '|' || CAST(day AS VARCHAR)), j, 1)) - 1)
        |        * (16.0 ** (4 - j)))) AS BIGINT) % 100""".stripMargin
    val f =
      s"""daily AS (
         |  SELECT n_name AS country, CAST(o_orderdate AS DATE) AS day,
         |    ${graft.Exact.dec6ToDoubleSql("SUM(CAST(o_totalprice AS DECIMAL(18,6)))")} AS target
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2
         |), lagged AS (
         |  SELECT country, day, target,
         |    $lagSelects
         |  FROM daily
         |), f AS (
         |  SELECT country, day, target, lag_1, lag_2, lag_3, lag_4, lag_5, lag_6, lag_7,
         |    CASE WHEN $bucket < 80 THEN 'train' ELSE 'test' END AS split,
         |    CASE WHEN $bucket < 80 THEN TRUE ELSE FALSE END AS is_train,
         |    CAST(round(target * 100) AS BIGINT) AS cents, $xCols
         |  FROM lagged WHERE lag_7 IS NOT NULL)""".stripMargin
    "WITH " + DetGbt.oracleCtes(f, nFeats = 7, bins = Bins, t = Trees, lr = Lr,
      depth = Depth) + ",\n" +
      """sc AS MATERIALIZED (SELECT split, pred / 100.0 AS prediction, lag_1 AS naive, target FROM gfin),
        |e AS MATERIALIZED (SELECT split,
        |  CAST(round((prediction - target) * 100) AS BIGINT) AS eg,
        |  CAST(round((naive - target) * 100) AS BIGINT) AS en,
        |  CAST(round(target * 100) AS BIGINT) AS cy FROM sc),
        |a AS MATERIALIZED (SELECT split, COUNT(*) AS n,
        |  SUM(CAST(eg AS DECIMAL(19,0)) * CAST(eg AS DECIMAL(19,0))) AS sg2,
        |  CAST(SUM(ABS(eg)) AS BIGINT) AS sga,
        |  SUM(CAST(en AS DECIMAL(19,0)) * CAST(en AS DECIMAL(19,0))) AS sn2,
        |  CAST(SUM(ABS(en)) AS BIGINT) AS sna,
        |  SUM(CAST(cy AS DECIMAL(38,0))) AS scy,
        |  SUM(CAST(cy AS DECIMAL(19,0)) * CAST(cy AS DECIMAL(19,0))) AS scy2
        |  FROM e GROUP BY 1),
        |v AS MATERIALIZED (SELECT a.*, CAST(n AS DOUBLE) AS nd,
        |  CAST(CAST(n AS HUGEINT) * CAST(scy2 AS HUGEINT)
        |     - CAST(scy AS HUGEINT) * CAST(scy AS HUGEINT) AS DECIMAL(38,0)) AS m
        |  FROM a)""".stripMargin + ",\n" +
      s"""vv AS MATERIALIZED (SELECT v.*, ${Exact.bigDecToDoubleSql("m")} / (nd * nd) AS varc FROM v)
         |SELECT 'gbt' AS model, split, n,
         |  sqrt(${Exact.bigDecToDoubleSql("sg2")} / nd) / 100.0 AS rmse,
         |  (CAST(sga AS DOUBLE) / nd) / 100.0 AS mae,
         |  1.0 - (${Exact.bigDecToDoubleSql("sg2")} / nd) / varc AS r2
         |FROM vv
         |UNION ALL
         |SELECT 'naive_lag1' AS model, split, n,
         |  sqrt(${Exact.bigDecToDoubleSql("sn2")} / nd) / 100.0 AS rmse,
         |  (CAST(sna AS DOUBLE) / nd) / 100.0 AS mae,
         |  1.0 - (${Exact.bigDecToDoubleSql("sn2")} / nd) / varc AS r2
         |FROM vv""".stripMargin
  }
}
