package graft

import graft.ml.DetKMeans
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic KMeans: the JVM/SQL conversion parity its oracles rest on,
  * tie-break direction, and fit determinism on real features. */
class DetKMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("bigDecToDoubleJvm equals the Column conversion across the 2^62/2^63 boundaries") {
    import spark.implicits._
    val cases = Seq(
      BigDecimal(0), BigDecimal(1), BigDecimal(Long.MaxValue),
      BigDecimal(4611686018427387903L), BigDecimal(4611686018427387904L),
      BigDecimal(2).pow(63), BigDecimal(2).pow(63) + 12345,
      BigDecimal(2).pow(90) + 987654321L,
      BigDecimal("99999999999999999999999999999"),
      // past 2^115 the split's hi no longer fits 53 bits — the regime where
      // the 100x gate caught DuckDB's decimal-division rounding (the SQL
      // twin now splits in HUGEINT; these pin the Spark/JVM pair there)
      BigDecimal(2).pow(115) + 3,
      BigDecimal(2).pow(118) + 12345,
      BigDecimal(2).pow(124) + 999,
      -BigDecimal(2).pow(120) - 424242,
      -BigDecimal(2).pow(63) - 777)
    val df = cases.map(_.toString).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("v"))
      .select(Exact.bigDecToDoubleSigned(col("v")).as("d"))
    val viaColumn = df.collect().map(_.getDouble(0))
    val viaJvm = cases.map(c => Exact.bigDecToDoubleJvm(c.bigDecimal))
    viaColumn.zip(viaJvm).zip(cases).foreach { case ((a, b), c) =>
      assert(a == b, s"JVM/Column conversion diverged at $c: $a vs $b")
    }
  }

  test("assignment ties break to the smallest cluster index") {
    import spark.implicits._
    val df = Seq(0.5, -0.5, 0.0).toDF("z0")
    val centers = Array(Array(0.0), Array(0.0), Array(1.0))
    val out = df.select(DetKMeans.assignExpr(Seq(col("z0")), centers).as("c"))
      .collect().map(_.getLong(0)).toSeq
    // clusters 0 and 1 are identical → every point equidistant between them
    // must land in 0, never 1
    assert(!out.contains(1L), s"tie went to the larger index: $out")
  }

  test("fit is deterministic across runs and covers every row exactly once") {
    val feats = graft.ml.Clustering.customerFeatures(spark, dir).persist()
    try {
      val (a1, m1) = DetKMeans.fit(feats, "customer_id", Seq("x0", "x1", "x2"), 4, 5)
      val (a2, m2) = DetKMeans.fit(feats, "customer_id", Seq("x0", "x1", "x2"), 4, 5)
      assert(m1.centers.flatten.toSeq == m2.centers.flatten.toSeq)
      val s1 = a1.select("customer_id", "cluster")
      val s2 = a2.select("customer_id", "cluster")
      assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
      assert(a1.count() == feats.count())
      assert(a1.select("cluster").distinct().count() >= 2)
    } finally feats.unpersist()
  }
}
