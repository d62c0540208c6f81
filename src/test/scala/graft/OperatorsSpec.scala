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

  test("corr significance: t replays the closed form and decisions follow the ladder") {
    val rows = Stats.corrSignificance(spark, dir).collect()
    assert(rows.length == 6, "C(4,2) measure pairs")
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr")
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("df") == n - 2)
      val t = r.getAs[Double]("t_stat")
      val expected = corr * math.sqrt((n.toDouble - 2.0) / (1.0 - corr * corr))
      assert(t == expected, s"t=$t expected=$expected")
      if (n - 2 >= 1000)
        assert(r.getAs[Boolean]("significant") == (math.abs(t) > 1.959963984540054))
      val strength = r.getAs[String]("strength")
      assert(strength == (if (math.abs(corr) > 0.9) "very_strong"
        else if (math.abs(corr) > 0.7) "strong" else "weak"))
      assert(r.getAs[String]("direction") == (if (corr > 0) "positive" else "negative"))
    }
  }

  test("corr clusters: threshold 0.8 vs a forced-zero threshold bracket the components") {
    val loose = Stats.corrClusters(spark, dir).collect()
    assert(loose.length == 4, "one row per measure field")
    // every cluster_id is a member field and sizes are consistent
    val byCluster = loose.groupBy(_.getAs[String]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.exists(_.getAs[String]("field") == cid), s"cluster label $cid not a member")
      members.foreach(m => assert(m.getAs[Long]("cluster_size") == members.length.toLong))
    }
    // threshold -1 makes every pair an edge -> one cluster labeled by the min field
    val all = Stats.corrClusters(spark, dir, threshold = -1.0).collect()
    assert(all.forall(_.getAs[String]("cluster_id") == "l_discount"))
    assert(all.forall(_.getAs[Long]("cluster_size") == 4L))
  }

  test("prediction drift: stats are finite and decisions replay the z ladder") {
    val rows = Drift.predictionDrift(spark, dir).collect()
    assert(rows.length == 25, "one row per country")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("z_mean"))) {
        val z = math.abs(r.getAs[Double]("z_mean"))
        assert(r.getAs[Boolean]("drift_detected") == z > 1.959963984540054)
        val sev = r.getAs[String]("severity")
        val expect = if (z > 3.2905267314919255) "critical"
          else if (z > 2.5758293035489004) "high"
          else if (z > 1.959963984540054) "medium" else "low"
        assert(sev == expect)
        assert(r.getAs[Double]("std_ref") >= 0.0 && r.getAs[Double]("std_cur") >= 0.0)
      }
    }
  }

  test("dagostino omnibus: z transforms replay scipy's closed forms bit-exactly") {
    val rows = Stats.dagostinoCheck(spark, dir).collect()
    assert(rows.length == 5, "one row per order priority")
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(n >= 20, "test corpus priorities all exceed the minimum sample")
      val g1 = r.getAs[Double]("skewness")
      val b2 = r.getAs[Double]("kurtosis")
      // D'Agostino skewness Z (same JVM Math calls as the codegen'd plan)
      val y0 = g1 * math.sqrt((n + 1.0) * (n + 3.0) / (6.0 * (n - 2.0)))
      val y = if (y0 == 0.0) 1.0 else y0
      val beta2 = 3.0 * (n * n + 27.0 * n - 70.0) * (n + 1.0) * (n + 3.0) /
        ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
      val w2 = math.sqrt(2.0 * (beta2 - 1.0)) - 1.0
      // portable transcendentals (the hash-exact plan's arithmetic-only
      // ln/cbrt, scalar twins) — ~1e-13 of the libm forms
      val delta = 1.0 / math.sqrt(0.5 * graft.operators.Drift.portableLnScalar(w2))
      val alpha = math.sqrt(2.0 / (w2 - 1.0))
      val u = y / alpha
      val z1 = delta * graft.operators.Drift.portableLnScalar(u + math.sqrt(u * u + 1.0))
      // Anscombe-Glynn kurtosis Z
      val eb2 = 3.0 * (n - 1.0) / (n + 1.0)
      val vb2 = 24.0 * n * (n - 2.0) * (n - 3.0) / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
      val x = (b2 - eb2) / math.sqrt(vb2)
      val sqrtbeta1 = 6.0 * (n * n - 5.0 * n + 2.0) / ((n + 7.0) * (n + 9.0)) *
        math.sqrt(6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
      val aa = 6.0 + 8.0 / sqrtbeta1 *
        (2.0 / sqrtbeta1 + math.sqrt(1.0 + 4.0 / (sqrtbeta1 * sqrtbeta1)))
      val term1 = 1.0 - 2.0 / (9.0 * aa)
      val denom = 1.0 + x * math.sqrt(2.0 / (aa - 4.0))
      val term2 = math.signum(denom) *
        graft.operators.Drift.portableCbrtScalar((1.0 - 2.0 / aa) / math.abs(denom))
      val z2 = (term1 - term2) / math.sqrt(2.0 / (9.0 * aa))
      assert(r.getAs[Double]("z_skew") == z1, s"z_skew ${r.getAs[Double]("z_skew")} != $z1")
      assert(r.getAs[Double]("z_kurt") == z2, s"z_kurt ${r.getAs[Double]("z_kurt")} != $z2")
      val k2 = z1 * z1 + z2 * z2
      assert(r.getAs[Double]("k2_stat") == k2)
      assert(r.getAs[Boolean]("is_normal") == (k2 < 5.991464547107979))
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
