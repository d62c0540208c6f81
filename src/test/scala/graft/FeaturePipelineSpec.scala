package graft

import graft.operators.{Drift, FeaturePipeline, Retention, TableHealth}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeaturePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("time features: weekday convention, weekend flag, unit-circle identity") {
    val tf = FeaturePipeline.timeFeatures(spark, dir)
    val n = Tables.orders(spark, dir).count()
    assert(tf.count() == n, "one feature row per order")
    val bad = tf.filter(
      col("order_weekday") < 0 || col("order_weekday") > 6 ||
      (col("is_weekend") =!= col("order_weekday").isin(5L, 6L)) ||
      abs(col("month_sin") * col("month_sin") + col("month_cos") * col("month_cos") - 1.0) > 1e-12 ||
      abs(col("weekday_sin") * col("weekday_sin") + col("weekday_cos") * col("weekday_cos") - 1.0) > 1e-12 ||
      col("days_since") < 0)
    assert(bad.count() == 0, "weekday/cyclical invariants violated")
  }

  test("group ratio features: mapped mean matches a direct aggregate") {
    val gf = FeaturePipeline.groupRatioFeatures(spark, dir)
    val one = gf.filter(col("country") === "NATION_7")
    val mapped = one.select("country_mean_totalprice").distinct().collect()
    assert(mapped.length == 1, "one mean per group")
    val direct = Tables.ordersWithCountry(spark, dir)
      .filter(col("country") === "NATION_7")
      .agg((Exact.decSumDbl(col("o_totalprice")) / Exact.countAll.cast("double")).as("m"))
      .collect()(0).getDouble(0)
    assert(mapped(0).getDouble(0) == direct, "mapped group mean != direct exact mean")
    val badRatio = one.filter(
      abs(col("price_to_country_mean_ratio") -
        col("o_totalprice") / (col("country_mean_totalprice") + lit(1e-8))) > 0)
    assert(badRatio.count() == 0)
  }

  test("interaction features are exact pairwise products") {
    val f = FeaturePipeline.interactionFeatures(spark, dir)
    val bad = f.filter(
      col("quantity_x_extendedprice") =!= col("l_quantity") * col("l_extendedprice") ||
      col("discount_x_tax") =!= col("l_discount") * col("l_tax"))
    assert(bad.count() == 0)
    assert(f.columns.count(_.contains("_x_")) == 6, "C(4,2) = 6 interaction columns")
  }

  test("ks drift matches an independently computed ECDF max-gap") {
    val row = Drift.ksDrift(spark, dir).filter(col("country") === "NATION_3").collect()(0)
    // recompute from raw data with plain Scala
    val raw = Tables.ordersWithCountry(spark, dir)
      .filter(col("country") === "NATION_3")
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        (col("o_orderdate") < lit("1998-01-01")).as("is_ref"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val ref = raw.filter(_._2).map(_._1).sorted
    val cur = raw.filterNot(_._2).map(_._1).sorted
    val values = (ref ++ cur).distinct.sorted
    val d = values.map { v =>
      val fr = ref.count(_ <= v).toDouble / ref.length
      val fc = cur.count(_ <= v).toDouble / cur.length
      math.abs(fr - fc)
    }.max
    assert(row.getAs[Long]("n_ref") == ref.length && row.getAs[Long]("n_cur") == cur.length)
    assert(row.getAs[Double]("ks_stat") == d, s"ks=${row.getAs[Double]("ks_stat")} expected $d")
  }

  test("portable ln agrees with libm ln to ~1e-13 relative over the drift domain") {
    import spark.implicits._
    // the full ratio domain the smoothed drift stats can produce, plus
    // awkward points (powers of two, just-below thresholds, 1.0 exactly)
    val xs = Seq(1e-8, 2.3e-8, 9.99e-7, 1e-4, 0.015625, 0.5, 0.9999999, 1.0,
      1.0000001, 1.5, 2.0, 3.0, 7.77, 1024.0, 1048576.0, 9.87e7)
    val got = xs.toDF("x").select(graft.operators.Drift.portableLn(col("x")).as("ln"))
      .collect().map(_.getDouble(0))
    xs.zip(got).foreach { case (x, v) =>
      val expect = math.log(x)
      val tol = math.max(math.abs(expect) * 1e-12, 1e-13)
      assert(math.abs(v - expect) <= tol, s"portableLn($x) = $v vs libm $expect")
    }
  }

  test("js drift is a bounded distance and covers every country") {
    val js = Drift.jsDrift(spark, dir).collect()
    assert(js.length == 25)
    val maxJs = math.sqrt(math.log(2.0))
    js.foreach { r =>
      val v = r.getAs[Double]("js_distance")
      assert(v >= 0.0 && v <= maxJs + 1e-12, s"js distance $v out of [0, sqrt(ln 2)]")
    }
  }

  test("categorical chi-square drift matches a hand-computed 2x2 contingency table") {
    import spark.implicits._
    // A: ref 30 / cur 10; B: ref 20 / cur 40 -> chi2 = 50/3 (textbook table)
    val src = (Seq.fill(30)(("A", true)) ++ Seq.fill(10)(("A", false)) ++
      Seq.fill(20)(("B", true)) ++ Seq.fill(40)(("B", false))).toDF("category", "is_ref")
    val r = Drift.featureChi2(src, "toy").collect()(0)
    // same IEEE sequence as the operator: zero-init fold in category order
    val dA = 30.0 * 50 - 10.0 * 50
    val dB = 20.0 * 50 - 40.0 * 50
    val expected = ((0.0 + dA * dA / 40.0) + dB * dB / 60.0) / (50.0 * 50.0)
    assert(r.getAs[Double]("chi2_stat") == expected)
    assert(math.abs(r.getAs[Double]("chi2_stat") - 50.0 / 3.0) < 1e-9)
    assert(r.getAs[Long]("df") == 1L && r.getAs[Long]("n_categories") == 2L)
    assert(r.getAs[Boolean]("significant"), "chi2 16.67 >> 3.84 critical at df=1")
    assert(r.getAs[String]("severity") == "critical", s"drift_score ${r.getAs[Double]("drift_score")}")
  }

  test("cat drift covers both features with the right dfs and ladder-consistent decisions") {
    val rows = Drift.catDrift(spark, dir).collect()
    assert(rows.map(_.getAs[String]("feature")).toSet == Set("country", "order_priority"))
    rows.foreach { r =>
      val k = r.getAs[Long]("n_categories")
      assert(r.getAs[Long]("df") == k - 1)
      assert(!r.isNullAt(r.fieldIndex("chi2_critical")), "df within the 1..30 ladder")
      assert(r.getAs[Double]("chi2_stat") >= 0.0)
      val score = r.getAs[Double]("drift_score")
      assert(r.getAs[Boolean]("drift_detected") == score > 0.1)
    }
  }

  test("psi drift: zero on identical windows, hand-computed on a shifted one") {
    import spark.implicits._
    // identical shares in both windows -> every (q-p) term is exactly 0
    val same = (Seq.fill(10)(("A", true)) ++ Seq.fill(10)(("A", false)) ++
      Seq.fill(5)(("B", true)) ++ Seq.fill(5)(("B", false))).toDF("category", "is_ref")
    assert(Drift.featurePsi(same, "same").collect()(0).getAs[Double]("psi") == 0.0)
    // shares ref (0.6, 0.4) -> cur (0.2, 0.8); eps-smoothing shifts ~1e-8
    val moved = (Seq.fill(6)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq.fill(4)(("B", true)) ++ Seq.fill(8)(("B", false))).toDF("category", "is_ref")
    val r = Drift.featurePsi(moved, "moved").collect()(0)
    val expected = (0.2 - 0.6) * math.log(0.2 / 0.6) + (0.8 - 0.4) * math.log(0.8 / 0.4)
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-6)
    assert(r.getAs[String]("stability") == "significant")
  }

  test("psi drift covers both real features with non-negative psi") {
    val rows = Drift.psiDrift(spark, dir).collect()
    assert(rows.map(_.getAs[String]("feature")).toSet == Set("country", "order_priority"))
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= 0.0, "PSI is a non-negative divergence")
      assert(Set("stable", "moderate", "significant").contains(r.getAs[String]("stability")))
    }
  }

  test("table health emits all six checks with sane variance percentages") {
    val th = TableHealth.tableHealth(spark, dir).collect()
    assert(th.length == 6)
    val names = th.map(r => (r.getAs[String]("table_name"), r.getAs[String]("check_name"))).toSet
    assert(names == Set(
      ("orders", "row_count_anomaly"), ("orders", "revenue_anomaly"),
      ("orders", "temporal_consistency"), ("lineitem", "duplicate_records"),
      ("customer", "null_percentage"), ("events", "data_freshness")))
    // the synthetic corpus genuinely carries duplicate (orderkey, linenumber)
    // business keys — the check must catch them; customer has no null segments
    val byName = th.map(r => (r.getAs[String]("check_name"), r)).toMap
    assert(!byName("duplicate_records").getAs[Boolean]("passed"))
    assert(byName("duplicate_records").getAs[Double]("observed") > 0)
    assert(byName("null_percentage").getAs[Double]("observed") == 0.0)
  }

  test("anomaly ensemble agrees with the standalone detectors") {
    val ens = graft.operators.Ensemble.anomalyEnsemble(spark, dir)
    // votes and score must be consistent within each row
    val bad = ens.filter(
      col("votes") < 0 || col("votes") > 3 ||
      (col("is_anomaly") =!= (col("votes") >= 2)) ||
      col("ensemble_score") < 0 || col("ensemble_score") > 1)
    assert(bad.count() == 0)
    // the z column must match the standalone z-score detector exactly
    val zs = graft.operators.Quality.anomalyOrders(spark, dir)
      .select(col("o_orderkey").as("k"), col("z").as("z_ref"))
    val joined = ens.join(zs, ens("o_orderkey") === col("k"))
    assert(joined.filter(col("z") =!= col("z_ref")).count() == 0,
      "ensemble z diverges from Quality.anomalyOrders")
  }

  test("lagged features: lag columns replay the prior positional values") {
    val lf = graft.operators.FeaturePipeline.laggedFeatures(spark, dir)
      .filter(col("country") === "NATION_5")
      .orderBy(col("day")).collect()
    assert(lf.nonEmpty)
    // lag_1 of row i equals target of row i-1 once inside the filtered range
    // (zip with tail: total even if the filtered series has a single row)
    lf.zip(lf.drop(1)).foreach { case (prev, curr) =>
      assert(curr.getAs[Double]("lag_1") == prev.getAs[Double]("target"))
    }
    lf.foreach { r => (1 to 7).foreach { k => assert(!r.isNullAt(r.fieldIndex(s"lag_$k"))) } }
  }

  test("business alerts: severities follow the threshold ladders") {
    val ba = graft.operators.Alerts.businessAlerts(spark, dir).collect()
    assert(ba.nonEmpty)
    ba.foreach { r =>
      val v = r.getAs[Double]("value")
      val sev = r.getAs[String]("severity")
      r.getAs[String]("metric") match {
        case "revenue_growth_rate" =>
          val expect = if (v <= -0.20) "emergency" else if (v <= -0.10) "critical"
            else if (v <= -0.05) "warning" else "ok"
          assert(sev == expect, s"growth $v -> $sev")
        case "customer_retention_rate" =>
          assert(v >= 0 && v <= 1, s"retention $v out of [0,1]")
          val expect = if (v < 0.65) "emergency" else if (v < 0.75) "critical"
            else if (v < 0.85) "warning" else "ok"
          assert(sev == expect, s"retention $v -> $sev")
      }
      assert(r.getAs[Boolean]("is_alert") == (sev != "ok"))
    }
  }

  test("product features: rolling frames grow monotonically within a part's first window") {
    val pf = graft.operators.RealtimeFeatures.productFeatures(spark, dir)
    // return rate is a proper ratio and popularity counts the row itself
    val bad = pf.filter(
      col("popularity_7d") < 1 ||
      col("return_rate_7d") < 0 || col("return_rate_7d") > 1 ||
      col("returns_7d") > col("popularity_7d"))
    assert(bad.count() == 0)
    // sample stddev is non-negative wherever defined
    assert(pf.filter(col("price_volatility_30d") < 0).count() == 0)
  }

  test("event anomalies: weighted composite matches the flag combination") {
    val ea = graft.operators.RealtimeFeatures.eventAnomalies(spark, dir)
    val bad = ea.filter(
      abs(col("anomaly_score") -
        ((when(col("is_value_anomaly"), 4L).otherwise(0L) +
          when(col("is_volume_anomaly"), 3L).otherwise(0L) +
          when(col("is_time_anomaly"), 2L).otherwise(0L)).cast("double") / 10.0)) > 0 ||
      (col("is_anomaly") =!= (col("anomaly_score") > 0.5)))
    assert(bad.count() == 0)
    assert(ea.count() == Tables.events(spark, dir).count())
  }

  test("cross consistency: overlap census adds up and rates stay in [0,1]") {
    val cc = graft.operators.CrossConsistency.crossConsistency(spark, dir).collect()
    assert(cc.length == 3)
    cc.foreach { r =>
      assert(r.getAs[Long]("common_records") + r.getAs[Long]("only_1") == r.getAs[Long]("records_1"))
      assert(r.getAs[Long]("common_records") + r.getAs[Long]("only_2") == r.getAs[Long]("records_2"))
      val rate = r.getAs[Double]("consistency_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Boolean]("passed") == (r.getAs[Long]("inconsistent") == 0L))
    }
    // the synthetic corpus has orders with no lineitems and a totalprice
    // that is NOT the line rollup — the checks must surface both
    val byId = cc.map(r => (r.getAs[String]("check_id"), r)).toMap
    assert(byId("key_overlap").getAs[Long]("only_1") > 0)
    assert(!byId("total_consistency").getAs[Boolean]("passed"))
  }

  test("retention bands partition the orders table") {
    val rp = Retention.retentionPolicy(spark, dir).collect()
    val total = rp.map(_.getAs[Long]("row_count")).sum
    assert(total == Tables.orders(spark, dir).count(), "bands must partition all rows")
    assert(math.abs(rp.map(_.getAs[Double]("pct_of_rows")).sum - 100.0) < 1e-9)
    val bands = rp.map(_.getAs[String]("retention_band")).toSet
    assert(bands.subsetOf(Set("active", "archive", "purge")) && bands.nonEmpty)
  }
}
