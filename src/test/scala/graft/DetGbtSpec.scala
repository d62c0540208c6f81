package graft

import graft.ml.DetGbt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic histogram boosting: fit determinism, the closure/
  * expression prediction parity the oracle rests on, and training-error
  * monotonicity. */
class DetGbtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toyDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (0 until 400).map { i =>
      val x0 = rnd.nextInt(1000).toLong
      val x1 = rnd.nextInt(1000).toLong
      // piecewise signal + noise, in "cents"
      val y = (if (x0 < 300) 10000L else 40000L) +
        (if (x1 < 500) 0L else 15000L) + rnd.nextInt(2000)
      (i.toLong, y, x0, x1, i % 10 < 8)
    }.toDF("id", "cents", "x0", "x1", "tr")
  }

  test("fit is deterministic and predictions match the training closure") {
    val df = toyDf.persist()
    try {
      val m1 = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 12)
      val m2 = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 12)
      assert(m1.stumps == m2.stumps && m1.f0 == m2.f0)
      assert(m1.stumps.length == 12)
      // the expression path must equal the fit's own residual closure:
      // recompute f per row in JVM exactly as the fit does and compare
      val rows = df.withColumn("p", DetGbt.predictExpr(m1, Seq("x0", "x1")))
        .select("cents", "x0", "x1", "p").collect()
      rows.foreach { r =>
        val bi = Array(r.getLong(1), r.getLong(2)).zipWithIndex.map { case (x, j) =>
          val xc = math.min(math.max(x, m1.mins(j)), m1.maxs(j))
          (((xc - m1.mins(j)) * m1.bins) / (m1.maxs(j) - m1.mins(j) + 1)).toInt
        }
        var f = m1.f0
        m1.stumps.foreach(s => f += (if (bi(s.j) <= s.b) s.wl else s.wr))
        assert(f == r.getDouble(3), s"expression/closure prediction diverged at $r")
      }
    } finally df.unpersist()
  }

  test("boosting reduces training error as stumps accumulate") {
    val df = toyDf.persist()
    try {
      def trainMse(t: Int): Double = {
        val m = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = t)
        df.filter(col("tr"))
          .withColumn("p", DetGbt.predictExpr(m, Seq("x0", "x1")))
          .agg(avg(pow(col("p") - col("cents"), 2))).head.getDouble(0)
      }
      val m2 = trainMse(2)
      val m12 = trainMse(12)
      assert(m12 < m2, s"more stumps did not reduce train MSE: $m12 vs $m2")
    } finally df.unpersist()
  }
}
