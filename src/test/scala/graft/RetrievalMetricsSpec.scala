package graft

import graft.text.HybridSearch
import org.scalatest.funsuite.AnyFunSuite

class RetrievalMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("dashboard grades all three rankings and fusion wins on nDCG") {
    val rows = HybridSearch.retrievalMetrics(spark, dir).collect()
    val byM = rows.map(r => r.getAs[String]("method") -> r).toMap
    assert(byM.keySet == Set("lexical", "vector", "hybrid"))
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg_at_k")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg $ndcg out of range")
      assert(r.getAs[Double]("p_at_k") >= 0.0 && r.getAs[Double]("p_at_k") <= 1.0)
      val rr = r.getAs[Double]("reciprocal_rank")
      assert(rr >= 0.0 && rr <= 1.0)
    }
    // RRF's pitch: dual-evidence docs surface earlier in the fused ranking
    val h = byM("hybrid").getAs[Double]("ndcg_at_k")
    assert(h >= byM("lexical").getAs[Double]("ndcg_at_k"), "hybrid < lexical")
    assert(h >= byM("vector").getAs[Double]("ndcg_at_k"), "hybrid < vector")
  }

  test("integer-scaled discounts equal the exact harmonic values") {
    // 27720/(p+1) must be exact for every position 1..11 (27720 = lcm(1..12))
    (1 to 11).foreach(p => assert(27720 % (p + 1) == 0, s"pos $p"))
    val rows = HybridSearch.retrievalMetrics(spark, dir).collect()
    rows.foreach { r =>
      // reciprocal_rank is exactly 1/first_rel for some integer rank <= 10
      val rr = r.getAs[Double]("reciprocal_rank")
      if (rr > 0.0)
        assert((1 to 10).exists(p => rr == (27720 / p).toDouble / 27720.0))
    }
  }
}
