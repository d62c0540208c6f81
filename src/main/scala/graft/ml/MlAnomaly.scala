package graft.ml

import graft.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-model-based anomaly detection (reference:
  * src/data_quality/core/anomaly_detection.py:435-557 `_detect_ml_anomalies`
  * — sklearn IsolationForest + DBSCAN over the standardized numeric columns
  * of a record batch, per-record anomaly flags with normalized confidence
  * scores).
  *
  * Neither algorithm ships in MLlib, and both are single-node in the
  * reference anyway (sklearn over a pandas batch). The Spark-native
  * equivalent keeps the reference's *contract* — standardize all numeric
  * features, fit an unsupervised model, flag records the model considers
  * isolated, score them [0,1] — with a distributed KMeans distance detector:
  *
  *  - IsolationForest analog: distance from a record to its assigned
  *    centroid, z-scored over the corpus; records beyond `zThresh` sigmas
  *    are exactly the "isolated in feature space" population the forest's
  *    contamination cut selects.
  *  - DBSCAN-noise analog: clusters with fewer than `minPts` members are
  *    noise by DBSCAN's own definition (min_samples), so their members are
  *    flagged regardless of distance.
  *
  * Scale shape: feature build is one lineitem groupBy (partial-agg) + one
  * shuffle join on the order key; KMeans is MLlib's distributed Lloyd's
  * (~maxIter scans of the cached features); scoring is a pure projection
  * (centroid lookup from a k-row literal array, codegen'd zip_with/aggregate
  * distance); the distance stats and the k cluster sizes are one aggregate
  * each, broadcast back. Nothing is driver-side except the 1-row stats and
  * the ≤k-row size frame — both bounded by knobs, not data.
  *
  * Seed-fixed (42) but hash/partition-order-dependent like MLlib KMeans
  * generally (customer_clusters precedent) → rows-only driver check +
  * MlAnomalySpec invariants.
  */
object MlAnomaly {

  /** Per-order numeric feature frame — the reference's
    * `_extract_numerical_features` over the order grain: total price plus
    * the line-level aggregates (line count, total quantity, mean discount).
    * Orders with no lines take 0.0, the reference's own missing-value
    * fallback (anomaly_detection.py:489 `record.get(field, 0)`). */
  def orderFeatures(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val li = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).cast("double").as("line_count"),
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_discount")).as("avg_discount"))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_totalprice"),
        coalesce(col("line_count"), lit(0.0)).as("line_count"),
        coalesce(col("sum_qty"), lit(0.0)).as("sum_qty"),
        coalesce(col("avg_discount"), lit(0.0)).as("avg_discount"))
  }

  private val FeatureCols = Array("o_totalprice", "line_count", "sum_qty", "avg_discount")

  /** KMeans-distance anomaly scores per order. `zThresh` plays the
    * IsolationForest contamination cut (distance z beyond it ⇒ anomaly);
    * `minPts` plays DBSCAN min_samples (smaller clusters are noise). */
  def mlAnomaly(spark: SparkSession, dir: String, k: Int = 8,
                zThresh: Double = 2.0, minPts: Int = 5): DataFrame = {
    // KMeans makes ~init+maxIter passes; cache the features for the fit
    // (the customer_clusters pattern, Clustering.scala:39)
    val feats = orderFeatures(spark, dir).persist()
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(FeatureCols).setOutputCol("__raw"),
      new StandardScaler().setInputCol("__raw").setOutputCol("__scaled")
        .setWithMean(true).setWithStd(true),
      new KMeans().setK(k).setSeed(42L).setMaxIter(20)
        .setFeaturesCol("__scaled").setPredictionCol("cluster")))
    val model = pipeline.fit(feats)
    val centers: Seq[Seq[Double]] = model.stages.last.asInstanceOf[KMeansModel]
      .clusterCenters.map(_.toArray.toSeq).toSeq

    // distance to the ASSIGNED centroid: k-row literal lookup + codegen'd
    // zip_with/aggregate — a pure projection, no UDF, no shuffle
    val scored = model.transform(feats)
      .withColumn("__arr", vector_to_array(col("__scaled"), "float64"))
      .withColumn("__c", element_at(typedLit(centers), col("cluster") + 1))
      .withColumn("dist",
        sqrt(aggregate(zip_with(col("__arr"), col("__c"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)))
      .select(col("o_orderkey"), col("o_totalprice"), col("line_count"),
        col("sum_qty"), col("avg_discount"), col("cluster").cast("long").as("cluster"),
        col("dist"))
      .persist()

    // corpus distance stats (1 row) + cluster populations (≤k rows): both
    // bounded aggregates, evaluated while the scored frame is cached and
    // embedded as literals — the final plan then reads scored exactly once
    val statsRow = scored.agg(
      avg(col("dist")).as("__mu"), stddev_samp(col("dist")).as("__sigma")).head
    val mu = if (statsRow.isNullAt(0)) 0.0 else statsRow.getDouble(0)
    val sigma = if (statsRow.isNullAt(1)) 0.0 else statsRow.getDouble(1)
    val sizeMap: Map[Long, Long] = scored.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val out = scored
      .withColumn("cluster_n", element_at(typedLit(sizeMap), col("cluster")))
      .withColumn("dist_z",
        if (sigma == 0.0) lit(0.0) else (col("dist") - lit(mu)) / lit(sigma))
      .withColumn("is_noise_cluster", col("cluster_n") < minPts)
      .withColumn("is_ml_anomaly",
        col("dist_z") > zThresh || col("is_noise_cluster"))
      // normalized confidence like the reference's min-max rescale
      // (anomaly_detection.py:524): [0,1], 1 at ≥3σ beyond the mean
      .withColumn("ml_score", least(greatest(col("dist_z"), lit(0.0)) / 3.0, lit(1.0)))
      .withColumn("severity",
        when(col("ml_score") >= 0.9, "critical")
          .when(col("ml_score") >= 0.7, "high")
          .when(col("ml_score") >= 0.5, "medium")
          .otherwise("low"))
      .select("o_orderkey", "o_totalprice", "line_count", "sum_qty", "avg_discount",
        "cluster", "cluster_n", "dist", "dist_z", "is_noise_cluster",
        "is_ml_anomaly", "ml_score", "severity")
    // feats has served the fit and the scored cache is already materialized
    // (the stats/size actions above ran it), so dropping feats is safe.
    // scored stays persisted ON PURPOSE: the returned frame reads it, and an
    // unpersist here would make every caller action re-run the whole scoring
    // pipeline. Contract: the cache is released by the caller's
    // spark.catalog.clearCache() (Verify/Bench do this between queries — the
    // RankOps localCheckpoint precedent) or by the ContextCleaner once the
    // frame is unreferenced.
    feats.unpersist()
    out
  }
}
