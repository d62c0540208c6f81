package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-portable scale-6 decimal→double sequence: the Column
  * form (what queries emit) must equal the JVM replica bit-for-bit across
  * the regimes where a plain cast breaks — unscaled past 2^53 (where
  * DuckDB's two-rounding decimal→double cast first diverges; caught live
  * by the 100× gate as enriched_sales' last-ulp revenue drift) and the
  * integer-part split boundaries. Below a 9e9 sum the sequence must also
  * equal the plain correctly-rounded cast, which is what keeps every
  * gate-SF hash unchanged. The DuckDB side of the pact is pinned by the
  * driver gate itself (dec6ToDoubleSql is embedded in the oracles). */
class ExactDec6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val cases = Seq(
    "0.000000", "1.000001", "-1.000001", "0.999999",
    "123456.789012", "-123456.789012",
    "8999999999.999999",                  // just below the 2^53-unscaled bound
    "9007199254.740993",                  // first past 2^53 unscaled
    "9999999999.999999",
    "237202573285.550015",                // the enriched_sales 100× regime
    "-237202573285.550015",
    "955871987380.203315",                // a measured DuckDB two-rounding case
    "4611686018427387904.123456",         // integer part exactly 2^62
    "4611686018427387905.654321",
    "9223372036854775807.000001",         // integer part ~2^63
    "9999999999999999999999999999999.999999",  // 1e31, top of DECIMAL(38,6)
    "-9999999999999999999999999999999.999999")

  test("dec6ToDouble Column form equals the JVM replica across all regimes") {
    import spark.implicits._
    val df = cases.toDF("s").select(col("s").cast("decimal(38,6)").as("v"))
      .select(col("v"), Exact.dec6ToDouble(col("v")).as("d"))
    val got = df.collect().map(r =>
      (r.getDecimal(0), r.getDouble(1))).toSeq
    got.foreach { case (v, d) =>
      val want = Exact.dec6ToDoubleJvm(v)
      assert(java.lang.Double.doubleToRawLongBits(d) ===
        java.lang.Double.doubleToRawLongBits(want), s"value $v")
    }
  }

  test("plain-cast parity holds where guaranteed: zero integer part or ≥ 2·5^6") {
    import spark.implicits._
    // the guarantee zone (see dec6ToDouble scaladoc): ip == 0, or ip ≥ 31250
    // — which covers every money-sum group in the suite (min order ~$900)
    val zone = cases.filter { s =>
      val ip = BigDecimal(s).abs.setScale(0, BigDecimal.RoundingMode.DOWN)
      (ip == 0 || ip >= 31250) && BigDecimal(s).abs < BigDecimal("1e31")
    }
    assert(zone.nonEmpty)
    val df = zone.toDF("s").select(col("s").cast("decimal(38,6)").as("v"))
      .select(col("v"), Exact.dec6ToDouble(col("v")).as("d"), col("v").cast("double").as("plain"))
    df.collect().foreach { r =>
      val (v, d, p) = (r.getDecimal(0), r.getDouble(1), r.getDouble(2))
      if (v.abs.doubleValue < 9e9) // past 9e9 the plain cast is the thing being replaced
        assert(java.lang.Double.doubleToRawLongBits(d) ===
          java.lang.Double.doubleToRawLongBits(p), s"value $v")
    }
  }
}
