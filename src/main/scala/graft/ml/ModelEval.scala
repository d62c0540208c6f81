package graft.ml

import graft.Exact
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.GBTRegressor
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
  * the split is the repo's deterministic md5-bucket recipe (TrainPrep
  * .hashBucket over the stable (country, day) grain — NOT randomSplit,
  * whose assignment depends on partitioning), and the model is MLlib's
  * distributed GBTRegressor with a fixed seed. A naive lag-1 persistence
  * baseline is evaluated on the identical splits so the report carries its
  * own control — the reference's trainer logs a baseline comparison the
  * same way (model_trainer.py's metrics dict).
  *
  * Scale shape: the matrix build is one groupBy + per-country lag windows
  * (country-partitioned — fine because the matrix grain is country×day,
  * bounded by calendar days, not raw rows); the GBT fit is MLlib's
  * distributed histogram boosting over the cached matrix; metric
  * aggregation is one partial-agg groupBy over the scored frame. Nothing
  * driver-side but the 4-row metric frame.
  *
  * Like `anomaly_ml`/`customer_clusters`, tree ensembles are
  * partition-order-dependent (bin boundaries from distributed sampling) →
  * rows-only driver check; ModelEvalSpec pins the invariants (split
  * arithmetic, metric identities, bounds, in-session determinism).
  */
object ModelEval {
  import Exact._

  private val LagCols = (1 to 7).map(k => s"lag_$k")

  /** The supervised matrix + deterministic split + predictions from both
    * models (gbt, naive lag-1 persistence). */
  def scoredMatrix(spark: SparkSession, dir: String): DataFrame = {
    val matrix = graft.operators.FeaturePipeline.laggedFeatures(spark, dir)
      // md5 split on the stable series grain: reproducible on any engine /
      // partitioning, the hash_split recipe (TrainPrep.scala:37)
      .withColumn("__bucket",
        conv(substring(md5(concat_ws("|", col("country"), col("day").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 100)
      .withColumn("split", when(col("__bucket") < 80, "train").otherwise("test"))
      .persist() // GBT makes ~maxIter passes (the Clustering.scala:39 pattern)

    val assembler = new VectorAssembler()
      .setInputCols(LagCols.toArray).setOutputCol("__features")
    val train = assembler.transform(matrix.filter(col("split") === "train"))
    val gbt = new GBTRegressor()
      .setFeaturesCol("__features").setLabelCol("target")
      .setPredictionCol("prediction")
      .setMaxIter(20).setMaxDepth(4).setStepSize(0.1).setSeed(42L)
    val model = gbt.fit(train)

    val scored = model.transform(assembler.transform(matrix))
      .withColumn("naive", col("lag_1"))
      .drop("__features", "__bucket")
    matrix.unpersist()
    scored
  }

  /** 4-row metric report: (model × split) → n, rmse, mae, r2. */
  def modelEval(spark: SparkSession, dir: String): DataFrame = {
    // scored is read exactly once (the groupBy below), so no persist here —
    // the fit inside scoredMatrix already cached the matrix for its passes
    val scored = scoredMatrix(spark, dir)
    val agg = scored.groupBy(col("split")).agg(
      countAll.as("n"),
      avg(pow(col("prediction") - col("target"), 2)).as("__mse_gbt"),
      avg(abs(col("prediction") - col("target"))).as("__mae_gbt"),
      avg(pow(col("naive") - col("target"), 2)).as("__mse_naive"),
      avg(abs(col("naive") - col("target"))).as("__mae_naive"),
      avg(col("target")).as("__mu"),
      avg(pow(col("target"), 2)).as("__mu2"))
      // population variance of the split's targets: E[y²] − E[y]²
      .withColumn("__var", col("__mu2") - col("__mu") * col("__mu"))
    val out = agg.select(
      expr("""stack(2,
        'gbt',        __mse_gbt,   __mae_gbt,
        'naive_lag1', __mse_naive, __mae_naive) AS (model, __mse, mae)"""),
      col("split"), col("n"), col("__var"))
      .withColumn("rmse", sqrt(col("__mse")))
      .withColumn("r2", lit(1.0) - col("__mse") / col("__var"))
      .select("model", "split", "n", "rmse", "mae", "r2")
    out
  }
}
