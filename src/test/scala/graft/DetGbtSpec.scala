package graft

import graft.ml.DetGbt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic histogram boosting: fit determinism, the closure/
  * expression prediction parity the oracle rests on, training-error
  * monotonicity, and the depth-2 interaction gain over stumps. */
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

  /** XOR-shaped interaction: purely additive depth-1 stumps cannot express
    * it, a single depth-2 tree can. */
  private def xorDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 400).map { i =>
      val x0 = rnd.nextInt(1000).toLong
      val x1 = rnd.nextInt(1000).toLong
      val y = (if ((x0 < 500) == (x1 < 500)) 10000L else 40000L) + rnd.nextInt(1000)
      (i.toLong, y, x0, x1, true)
    }.toDF("id", "cents", "x0", "x1", "tr")
  }

  /** Recompute the model's prediction for a row in JVM exactly as the fit's
    * residual closure does. */
  private def closurePred(m: DetGbt.Model, xs: Array[Long]): Double = {
    val bi = xs.zipWithIndex.map { case (x, j) =>
      val xc = math.min(math.max(x, m.mins(j)), m.maxs(j))
      (((xc - m.mins(j)) * m.bins) / (m.maxs(j) - m.mins(j) + 1)).toInt
    }
    var f = m.f0
    m.trees.foreach { t =>
      f += (if (bi(t.j) <= t.b) t.left match {
        case Some(s) => if (bi(s.j) <= s.b) s.wl else s.wr
        case None => t.lw
      } else t.right match {
        case Some(s) => if (bi(s.j) <= s.b) s.wl else s.wr
        case None => t.rw
      })
    }
    f
  }

  for (depth <- Seq(1, 2))
    test(s"depth-$depth fit is deterministic and predictions match the training closure") {
      val df = toyDf.persist()
      try {
        val m1 = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 12, depth = depth)
        val m2 = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 12, depth = depth)
        assert(m1.trees == m2.trees && m1.f0 == m2.f0)
        assert(m1.trees.length == 12)
        if (depth == 1) assert(m1.trees.forall(t => t.left.isEmpty && t.right.isEmpty))
        val rows = df.withColumn("p", DetGbt.predictExpr(m1, Seq("x0", "x1")))
          .select("cents", "x0", "x1", "p").collect()
        rows.foreach { r =>
          val f = closurePred(m1, Array(r.getLong(1), r.getLong(2)))
          assert(f == r.getDouble(3), s"expression/closure prediction diverged at $r")
        }
      } finally df.unpersist()
    }

  /** r17: the fit became one bounded collect + driver loop — pin that the
    * model is invariant to input partitioning and row order (every
    * histogram cell is an order-free exact long sum, so any arrival order
    * must produce identical trees). */
  test("fit is invariant to input partitioning and row order") {
    val df = toyDf
    val m1 = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 8, depth = 2)
    val shuffled = df.orderBy(rand(42)).repartition(7)
    val m2 = DetGbt.fit(shuffled, "cents", Seq("x0", "x1"), col("tr"), bins = 16, t = 8, depth = 2)
    assert(m1.f0 == m2.f0 && m1.mins.toSeq == m2.mins.toSeq &&
      m1.maxs.toSeq == m2.maxs.toSeq && m1.trees == m2.trees)
  }

  test("boosting reduces training error as trees accumulate") {
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
      assert(m12 < m2, s"more trees did not reduce train MSE: $m12 vs $m2")
    } finally df.unpersist()
  }

  test("depth-2 learns the XOR interaction depth-1 cannot") {
    val df = xorDf.persist()
    try {
      def trainMse(depth: Int): Double = {
        // lr high enough that the interaction is learnable within t rounds:
        // on XOR every single-feature ROOT split has ~zero gain (both sides
        // share the mean), so each tree only cracks the quadrants its
        // noise-chosen root happens to separate — convergence is paced by
        // lr, not by expressiveness
        val m = DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"),
          bins = 16, t = 24, lr = 0.5, depth = depth)
        df.withColumn("p", DetGbt.predictExpr(m, Seq("x0", "x1")))
          .agg(avg(pow(col("p") - col("cents"), 2))).head.getDouble(0)
      }
      val mse1 = trainMse(1)
      val mse2 = trainMse(2)
      // the XOR signal has amplitude 30000 cents: stumps stay near the
      // global mean (MSE ~ 2.25e8), depth-2 carves all four quadrants
      assert(mse2 < mse1 / 5.0,
        s"depth-2 did not crack the interaction: mse2=$mse2 mse1=$mse1")
    } finally df.unpersist()
  }

  test("fit rejects a train frame above the bounded-collect cap") {
    val df = toyDf
    val e = intercept[IllegalArgumentException] {
      DetGbt.fit(df, "cents", Seq("x0", "x1"), col("tr"), maxRows = 10L)
    }
    assert(e.getMessage.contains("MaxDriverRows"),
      s"guard message should name the cap: ${e.getMessage}")
    // the shipped default is far above any grain-bounded frame
    assert(DetGbt.MaxDriverRows >= 1000000L)
  }
}
