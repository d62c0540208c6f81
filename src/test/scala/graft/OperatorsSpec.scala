package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sanity/semantics tests for the oracle-backed operators. Exact value
  * correctness is enforced by the DuckDB crosscheck gate (tools/crosscheck.py
  * — see .claude/skills/verify); these tests pin the semantic invariants that
  * survive data changes. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("salesSummary aggregates are positive and grouped uniquely") {
    val rows = Gold.salesSummary(spark, dir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("country"), r.getAs[Long]("order_year"), r.getAs[Long]("order_month")))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("total_revenue") > 0)
      assert(r.getAs[Long]("total_orders") <= r.getAs[Long]("total_lines"))
      assert(r.getAs[Long]("unique_customers") <= r.getAs[Long]("total_orders"))
    }
  }

  test("productAnalysis rank starts at 1 and is dense within each country") {
    val rows = Gold.productAnalysis(spark, dir)
      .select("country", "revenue_rank_in_country").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.values.foreach(rs => assert(rs.toSeq == (1L to rs.length).toSeq))
  }

  test("rfmSegments scores are 1..5 and segments non-empty") {
    val rows = Gold.rfmSegments(spark, dir).collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("recency_score", "frequency_score", "monetary_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1 && v <= 5)
      }
      assert(r.getAs[String]("rfm_score").matches("[1-5][1-5][1-5]"))
    }
  }

  test("silver dedup leaves one row per business key and filters bad rows") {
    val df = Silver.cleanLineitem(spark, dir)
    assert(df.groupBy("l_orderkey", "l_partkey").count().filter(col("count") > 1).count() == 0)
    assert(df.filter(col("l_quantity") <= 0).count() == 0)
  }

  test("scd2 has exactly one current version per customer, valid_to chains") {
    val df = Scd2.scd2Customer(spark, dir)
    val cur = df.filter(col("is_current")).groupBy("customer_id").count()
    assert(cur.filter(col("count") =!= 1).count() == 0)
    assert(df.filter(col("is_current") && col("valid_to").isNotNull).count() == 0)
    assert(df.filter(!col("is_current") && col("valid_to").isNull).count() == 0)
  }

  test("running totals are non-decreasing per customer over positive amounts") {
    val bad = Windowing.runningTotals(spark, dir)
      .withColumn("prev_rt", lag(col("running_total"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("order_date", "o_orderkey")))
      .filter(col("prev_rt").isNotNull && col("running_total") < col("prev_rt"))
    assert(bad.count() == 0)
  }

  test("events sessions respect the 30-minute gap invariant") {
    val s = Events.sessions(spark, dir).collect()
    assert(s.nonEmpty)
    s.foreach { r => assert(r.getAs[Long]("duration_seconds") >= 0) }
    // sessions of one user never overlap: starts sorted == starts
    s.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val spans = rs.map(r => (r.getAs[String]("session_start"), r.getAs[String]("session_end"))).sortBy(_._1).toSeq
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2 || spans.length == 1)
        case _ =>
      }
    }
  }

  test("anomaly flags are consistent with the 3-sigma rule") {
    val rows = Quality.anomalyOrders(spark, dir).collect()
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(r.getAs[Boolean]("is_outlier") == (math.abs(z) > 3.0))
    }
  }

  test("dim_date covers the full span with unique keys") {
    val d = StarSchema.dimDate(spark, dir)
    val n = d.count()
    assert(d.select("date_key").distinct().count() == n)
    assert(d.filter(col("is_weekend")).count() > 0)
  }
}
