package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMeans-distance ML anomaly detector (MlAnomaly) — oracle-hash-checked
  * since the DetKMeans swap (round 10), but the behavioral invariants stay
  * pinned here too: grain, score bounds, flag/threshold consistency,
  * determinism within a session, and the ensemble wiring arithmetic. */
class MlAnomalySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  private lazy val out = graft.ml.MlAnomaly.mlAnomaly(spark, dir).cache()

  test("one row per order, no null scores") {
    val orders = Tables.orders(spark, dir).count()
    assert(out.count() === orders)
    assert(out.filter(col("dist").isNull || col("ml_score").isNull ||
      col("is_ml_anomaly").isNull).count() === 0)
  }

  test("ml_score within [0,1] and monotone with dist_z") {
    assert(out.filter(col("ml_score") < 0.0 || col("ml_score") > 1.0).count() === 0)
    // score is the clamped positive z/3: anything at z ≥ 3 scores exactly 1
    assert(out.filter(col("dist_z") >= 3.0 && col("ml_score") =!= 1.0).count() === 0)
    assert(out.filter(col("dist_z") <= 0.0 && col("ml_score") =!= 0.0).count() === 0)
  }

  test("anomaly flag = distance cut OR noise cluster, and the cut is ~contamination-sized") {
    val bad = out.filter(
      col("is_ml_anomaly") =!= (col("dist_z") > 2.0 || col("is_noise_cluster"))).count()
    assert(bad === 0)
    // z>2 on a one-sided heavy tail: a minority population, never the bulk
    val n = out.count().toDouble
    val flagged = out.filter(col("is_ml_anomaly")).count().toDouble
    assert(flagged / n < 0.2, s"flagged ${flagged / n} of corpus")
    assert(flagged > 0, "detector flagged nothing at all")
  }

  test("noise-cluster rule: members of clusters below minPts are all flagged") {
    assert(out.filter(col("cluster_n") < 5 && !col("is_ml_anomaly")).count() === 0)
  }

  test("cluster_n is consistent with the actual cluster populations") {
    val bad = out.groupBy("cluster", "cluster_n").agg(count(lit(1)).as("actual"))
      .filter(col("cluster_n") =!= col("actual")).count()
    assert(bad === 0)
  }

  test("deterministic within a session (fixed seed, same data)") {
    val again = graft.ml.MlAnomaly.mlAnomaly(spark, dir)
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }

  test("ensemble wiring: 4th vote arithmetic and re-laddered severity") {
    val ens = graft.operators.Ensemble.anomalyEnsembleMl(spark, dir).cache()
    try {
      assert(ens.count() === Tables.orders(spark, dir).count())
      assert(ens.filter(col("votes") < 0 || col("votes") > 4).count() === 0)
      assert(ens.filter(col("is_anomaly") =!= (col("votes") >= 2)).count() === 0)
      assert(ens.filter(col("ensemble_score") < 0.0 || col("ensemble_score") > 1.0)
        .count() === 0)
      // the 3-vote parent is recoverable: score4 = (3·score3 + ml)/4, so the
      // ML vote can move the composite by at most 0.25
      val stat = graft.operators.Ensemble.anomalyEnsemble(spark, dir)
        .select(col("o_orderkey").as("k"), col("ensemble_score").as("s3"))
      val drift = ens.join(stat, col("o_orderkey") === col("k"))
        .filter(abs(col("ensemble_score") - col("s3")) > 0.25 + 1e-9).count()
      assert(drift === 0)
    } finally ens.unpersist()
  }
}
