package graft

import graft.operators.{Behavior, Integrity, Vault}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the data-vault build, integrity suites, and
  * behavioral analytics (exact values pinned by the DuckDB crosscheck). */
class VaultSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("vault model: one link row per order, hash keys are md5-shaped and key-determined") {
    val df = Vault.vaultModel(spark, dir)
    assert(df.count() == Tables.orders(spark, dir).count())
    // same business key => same hash key (customer appears across orders)
    val custHk = df.select("customer_key", "customer_hk").distinct()
    assert(custHk.groupBy("customer_key").count().filter(col("count") > 1).count() == 0)
    val row = df.head()
    assert(row.getAs[String]("order_hk").matches("[0-9a-f]{32}"))
    assert(row.getAs[String]("link_order_customer_hk").matches("[0-9a-f]{32}"))
  }

  test("vault integrity: drifted hub produces orphan refs; no duplicate hash keys") {
    val rows = Vault.vaultIntegrity(spark, dir).collect()
      .map(r => r.getAs[String]("test_type") -> r.getAs[Long]("n_failures")).toMap
    assert(rows("hub_null_business_keys") == 0)
    assert(rows("orphaned_satellite_customer") > 0)  // the % 10 = 3 drift
    assert(rows("orphaned_link_customer_ref") > 0)
    assert(rows("orphaned_link_order_ref") == 0)
    assert(rows("duplicate_hub_hash_key") == 0)
    assert(rows("duplicate_link_hash_key") == 0)
  }

  test("referential integrity: every star edge is covered and consistent") {
    val rows = Integrity.referentialIntegrity(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("orphan_rows") >= 0)
      assert(r.getAs[Long]("orphan_rows") <= r.getAs[Long]("child_rows"))
      val pct = r.getAs[Double]("integrity_pct")
      assert(pct >= 0.0 && pct <= 100.0)
      if (r.getAs[Long]("orphan_rows") == 0) assert(pct == 100.0)
    }
  }

  test("behavioral analytics: velocity counts self, ladders are consistent") {
    val rows = Behavior.behavioralAnalytics(spark, dir).collect()
    assert(rows.length == Tables.events(spark, dir).count())
    rows.foreach { r =>
      val v = r.getAs[Double]("purchase_velocity")
      assert(v >= 0.0)
      // the 24h window always includes the current event
      if (r.getAs[String]("event_type") == "purchase") assert(v >= 1.0 / 24.0)
      assert(r.getAs[Long]("events_7d") >= 1)
      val pattern = r.getAs[String]("shopping_pattern")
      if (r.getAs[Long]("events_7d") > 5) assert(pattern == "frequent")
      else if (r.getAs[Double]("avg_value_30d") > 100.0) assert(pattern == "high_value")
      else if (r.getAs[Boolean]("is_weekend")) assert(pattern == "weekend_shopper")
      else assert(pattern == "casual")
      assert(Set("active", "regular", "at_risk", "dormant")
        .contains(r.getAs[String]("lifecycle_stage")))
    }
  }
}
