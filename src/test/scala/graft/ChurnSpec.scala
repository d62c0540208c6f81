package graft

import graft.operators.Churn
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for churn-risk scoring and CLV (exact values are
  * pinned by the DuckDB crosscheck gate). */
class ChurnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("churn risk covers every customer; ladders and composite are consistent") {
    val rows = Churn.churnRisk(spark, dir).collect()
    val customers = Tables.customer(spark, dir).count()
    assert(rows.length == customers)
    rows.foreach { r =>
      val risks = Seq("recency_risk", "frequency_risk", "revenue_trend_risk", "activity_risk")
        .map(r.getAs[Int])
      risks.foreach(v => assert(v >= 0 && v <= 5))
      assert(r.getAs[Int]("churn_risk_score") == risks.sum)
      val p = r.getAs[Double]("churn_probability")
      assert(Set(0.1, 0.3, 0.6, 0.8, 0.95).contains(p))
      // category tier and probability tier move together
      val cat = r.getAs[String]("churn_risk_category")
      if (risks.sum <= 4) assert(cat == "Low Risk")
      if (risks.sum > 12) assert(cat == "Critical Risk")
    }
  }

  test("customers with no orders score maximum risk on every ladder") {
    val noOrders = Churn.churnRisk(spark, dir)
      .filter(org.apache.spark.sql.functions.col("total_orders") === 0L)
      .collect()
    noOrders.foreach { r =>
      assert(r.getAs[Int]("churn_risk_score") == 20)
      assert(r.getAs[String]("churn_risk_category") == "Critical Risk")
      assert(r.getAs[Double]("total_spent") == 0.0)
    }
  }

  test("clv: total = historical + predicted (at cents precision), segments match thresholds") {
    val rows = Churn.customerClv(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hist = r.getAs[Double]("historical_value")
      val pred = r.getAs[Double]("predicted_clv")
      val total = r.getAs[Double]("total_clv")
      assert(pred >= 0.0)
      assert(math.abs(total - (hist + pred)) < 1e-6)
      val seg = r.getAs[String]("clv_segment")
      if (total >= 1000.0) assert(seg == "High Value")
      if (total < 100.0) assert(seg == "Minimal Value")
      assert(r.getAs[Double]("churn_probability") >= 0.1)
    }
  }
}
