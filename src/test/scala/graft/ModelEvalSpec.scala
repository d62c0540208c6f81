package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Supervised GBT training/eval report (ModelEval) — oracle-hash-checked
  * since the DetGbt swap (round 10); these invariants stay pinned too:
  * split arithmetic, metric identities, bounds, and the fitted model
  * actually learning the training set. */
class ModelEvalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  private lazy val scored = graft.ml.ModelEval.scoredMatrix(spark, dir).cache()
  private lazy val out = graft.ml.ModelEval.modelEval(spark, dir).cache()

  test("report shape: model x split grid, counts partition the matrix") {
    val rows = out.collect()
    assert(rows.length === 4)
    assert(rows.map(r => (r.getAs[String]("model"), r.getAs[String]("split"))).toSet ===
      Set(("gbt", "train"), ("gbt", "test"), ("naive_lag1", "train"), ("naive_lag1", "test")))
    val matrixN = graft.operators.FeaturePipeline.laggedFeatures(spark, dir).count()
    val nBySplit = out.filter(col("model") === "gbt")
      .select("split", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nBySplit.values.sum === matrixN)
    assert(nBySplit.values.forall(_ > 0), s"empty split: $nBySplit")
  }

  test("split is the deterministic md5 bucket, not random") {
    // same (country, day) always lands in the same split — recompute equals
    val again = graft.ml.ModelEval.scoredMatrix(spark, dir)
      .select("country", "day", "split")
    val diff = scored.select("country", "day", "split")
      .except(again).count()
    assert(diff === 0)
  }

  test("metric identities and bounds") {
    out.collect().foreach { r =>
      val (rmse, mae, r2) = (r.getAs[Double]("rmse"), r.getAs[Double]("mae"), r.getAs[Double]("r2"))
      assert(!rmse.isNaN && !mae.isNaN && !r2.isNaN, s"NaN metric in $r")
      assert(rmse >= 0 && mae >= 0)
      // RMS ≥ mean-absolute always (Jensen)
      assert(mae <= rmse + 1e-9, s"mae $mae > rmse $rmse")
      assert(r2 <= 1.0 + 1e-9)
    }
  }

  test("GBT learns the training set: r2(train) positive and beats naive persistence") {
    val m = out.collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("split")) -> r.getAs[Double]("r2")).toMap
    assert(m(("gbt", "train")) > 0.0, s"train r2 ${m(("gbt", "train"))}")
    assert(m(("gbt", "train")) >= m(("naive_lag1", "train")) - 1e-9,
      "a 30-tree boosted fit on 7 lags should not lose to lag-1 persistence on its own training split")
  }

  test("depth-2 trees fit the training set better than depth-1 stumps") {
    def trainSse(depth: Int): Double =
      graft.ml.ModelEval.scoredMatrix(spark, dir, depth = depth)
        .filter(col("split") === "train")
        .agg(sum(pow(col("prediction") - col("target"), 2))).head.getDouble(0)
    val sse1 = trainSse(1)
    val sse2 = trainSse(2)
    assert(sse2 < sse1,
      s"depth-2 should reduce train SSE over stumps: depth2=$sse2 depth1=$sse1")
  }

  test("predictions are finite on every row") {
    assert(scored.filter(col("prediction").isNull || isnan(col("prediction")) ||
      col("prediction") === Double.PositiveInfinity ||
      col("prediction") === Double.NegativeInfinity).count() === 0)
  }
}
