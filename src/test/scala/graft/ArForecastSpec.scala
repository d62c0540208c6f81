package graft

import graft.operators.ArForecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArForecastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("every nation gets 6 horizons; coefficients constant per nation") {
    val out = ArForecast.arForecast(spark, dir).persist()
    val nNations = Tables.nation(spark, dir).count()
    assert(out.count() == nNations * ArForecast.Horizon)
    val per = out.groupBy("n_name").agg(
      count(lit(1)).as("n"),
      countDistinct(col("phi1")).as("d1"),
      countDistinct(col("phi2")).as("d2"))
    assert(per.filter(col("n") =!= ArForecast.Horizon).count() == 0)
    assert(per.filter(col("d1") > 1 || col("d2") > 1).count() == 0)
    assert(out.filter(col("scale_pow") < 0).count() == 0)
    out.unpersist()
    spark.catalog.clearCache()
  }

  private def plant(ys: Seq[Long]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ar_plant").toString
    ys.zipWithIndex.map { case (cents, t) =>
      (t.toLong, java.sql.Date.valueOf(
        f"${1992 + t / 12}%04d-${t % 12 + 1}%02d-15"), cents / 100.0, 1L)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, "PLANTED")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    tmp
  }

  test("a planted exact AR(2) series recovers its own coefficients and continuation") {
    // y_t = 10 + 2*y_{t-1} - y_{t-2}, integer cents, zero residual — the
    // LS solution is the generating triple and forecasts ARE the true
    // continuation (up to double rounding in the solve)
    val ys = scala.collection.mutable.ArrayBuffer(100L, 120L)
    while (ys.length < 36) ys += 10L + 2L * ys(ys.length - 1) - ys(ys.length - 2)
    val out = ArForecast.arForecast(spark, plant(ys.toSeq))
      .orderBy("horizon").collect()
    assert(out.length == ArForecast.Horizon)
    val (p1, p2, c) = (out.head.getAs[Double]("phi1"),
      out.head.getAs[Double]("phi2"), out.head.getAs[Double]("intercept"))
    assert(math.abs(p1 - 2.0) < 1e-6, s"phi1=$p1")
    assert(math.abs(p2 + 1.0) < 1e-6, s"phi2=$p2")
    assert(math.abs(c - 10.0) < 1e-3, s"intercept=$c")
    // true continuation
    val cont = scala.collection.mutable.ArrayBuffer(ys.toSeq: _*)
    while (cont.length < 42) cont += 10L + 2L * cont(cont.length - 1) - cont(cont.length - 2)
    (1 to 6).foreach { h =>
      val f = out(h - 1).getAs[Double]("forecast_scaled")
      val expect = cont(35 + h).toDouble
      assert(math.abs(f - expect) / expect < 1e-6, s"h=$h f=$f expect=$expect")
    }
    spark.catalog.clearCache()
  }

  test("a constant series is singular (collinear lags) and forecasts NULL") {
    // all-equal observations make the normal matrix rows identical; each
    // cofactor term cancels EXACTLY in binary64, so bad triggers
    val out = ArForecast.arForecast(spark, plant(Seq.fill(30)(5000L)))
      .orderBy("horizon").collect()
    assert(out.length == ArForecast.Horizon)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("forecast_scaled"))))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("phi1"))))
    spark.catalog.clearCache()
  }
}
