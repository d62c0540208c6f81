package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data Vault 2.0 raw-vault modeling over the order/customer stream
  * (reference: dbt/macros/data_vault_modeling.sql — hub/link/satellite
  * layout with hash keys, and `test_data_vault_integrity`:3-101).
  *
  * Hash keys are md5 over the business keys (chr(1)-separated, chr(2) null
  * sentinel — the repo's cross-engine checksum recipe, Incremental.rowHash);
  * the satellite carries an md5 hashdiff over the tracked attributes, the
  * standard DV2 change-detection column.
  *
  * Scale shapes: hub/link/sat all derive from ONE pass over orders (hash
  * keys are projections — no shuffle); the integrity report's orphan checks
  * are key-shuffle anti-joins and the duplicate checks are groupBy counts on
  * the hash key — each a single exchange on a key that scales with data.
  */
object Vault {

  private def hk(cols: Column*): Column =
    md5(concat_ws("\u0001", cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))

  /** The raw-vault build at order grain: link_order_customer with both hub
    * hash keys plus the order-satellite hashdiff and payload. One scan, zero
    * shuffles — hash keys are pure projections. */
  def vaultModel(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
      hk(col("o_orderkey"), col("o_custkey")).as("link_order_customer_hk"),
      hk(col("o_orderkey")).as("order_hk"),
      hk(col("o_custkey")).as("customer_hk"),
      col("o_orderkey").as("order_key"),
      col("o_custkey").as("customer_key"),
      // price enters the hashdiff as integer cents: double→string rendering
      // is not portable across engines (SURVEY §3), integer strings are
      hk(col("o_orderstatus"), round(col("o_totalprice") * 100, 0).cast("long"),
        col("o_orderpriority")).as("sat_order_hashdiff"),
      col("o_orderstatus").as("order_status"),
      col("o_orderpriority").as("order_priority"))
  }

  /** Vault integrity test report (reference macro `test_data_vault_integrity`:
    * hub null business keys, orphaned satellites, orphaned link references,
    * duplicate hash keys). The hub side loads from a drifted customer
    * snapshot (key % 10 != 3 — the snapshot_diff convention) so orphan
    * references genuinely exist, as they do mid-load in a real vault.
    *
    * Single-pass shape (r7 verdict task: the previous four anti-joins + two
    * duplicate groupBys each shuffled the full key set): each base table is
    * scanned ONCE and exploded into a tall tagged key frame; every check
    * then falls out of ONE (space, k1, k2) aggregate — orphans are keys
    * whose reference count is positive but hub count is zero, duplicates
    * are keys whose own-space count exceeds one — followed by a six-counter
    * global rollup exploded back into the report rows.
    *
    * The shuffle carries RAW integer business keys, not md5 strings: the
    * report emits only counts, and two business keys collide iff their
    * hash keys collide, so the md5 (32-char strings, one digest per row)
    * buys nothing on this path — vaultModel still materializes the real
    * hash keys for the vault build. Counter rows for the same (space, key)
    * are pre-merged at explode time (order hub+ref in one row, customer
    * hub+sat in one row), so the exchange moves ≤ 3 rows per order + 1 per
    * customer of ~50 narrow bytes. The 100× probe that motivated this: the
    * md5-string explode shuffled 63M wide rows in 16.7 s where the old
    * four broadcast anti-joins took 8.3 s — broadcasting works at probe
    * scale but not when hubs outgrow executor memory; narrowing the one
    * exchange is what keeps the single-pass shape competitive at BOTH
    * scales. */
  def vaultIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // space codes: 0 = customer hub, 1 = order hub, 2 = link
    def row(space: Int, k1: Column, k2: Column, hub: Long, sat: Long, ref: Long,
            nullBk: Column): Column =
      struct(lit(space).as("space"), k1.cast("long").as("k1"), k2.cast("long").as("k2"),
        lit(hub).as("hub_c"), lit(sat).as("sat_c"), lit(ref).as("ref_c"),
        nullBk.cast("long").as("null_bk"))
    val zero = lit(0L)
    val noK2 = lit(null).cast("long")

    // one orders scan: link's customer-hub ref; order hub + its own ref
    // (merged — same key, one row); the link key itself
    val orderRows = Tables.orders(spark, dir).select(explode(array(
      row(0, col("o_custkey"), noK2, 0L, 0L, 1L, zero),
      row(1, col("o_orderkey"), noK2, 1L, 0L, 1L, zero),
      row(2, col("o_orderkey"), col("o_custkey"), 0L, 0L, 1L, zero))).as("r"))
    // one customer scan: hub+satellite merged for the drifted snapshot,
    // satellite-only for the rows the snapshot dropped
    val custRows = Tables.customer(spark, dir).select(explode(array(
      when(col("c_custkey") % 10 =!= 3,
        row(0, col("c_custkey"), noK2, 1L, 1L, 0L,
          when(col("c_custkey").isNull, 1L).otherwise(0L)))
      .otherwise(
        row(0, col("c_custkey"), noK2, 0L, 1L, 0L, zero)))).as("r"))

    val keyed = orderRows.unionByName(custRows).select(col("r.*"))
      .groupBy("space", "k1", "k2")
      .agg(sum("hub_c").as("hub_n"), sum("sat_c").as("sat_n"),
        sum("ref_c").as("ref_n"), sum("null_bk").as("nb"))
    val g = keyed.agg(
      sum("nb").as("n_null"),
      sum(when(col("space") === 0 && col("hub_n") === 0, col("sat_n")).otherwise(0L))
        .as("orphan_sat"),
      sum(when(col("space") === 0 && col("hub_n") === 0, col("ref_n")).otherwise(0L))
        .as("orphan_link_cust"),
      sum(when(col("space") === 1 && col("hub_n") === 0, col("ref_n")).otherwise(0L))
        .as("orphan_link_order"),
      sum(when(col("space") === 0 && col("hub_n") > 1, 1L).otherwise(0L))
        .as("dup_hub"),
      sum(when(col("space") === 2 && col("ref_n") > 1, 1L).otherwise(0L))
        .as("dup_link"))
    g.select(explode(array(
        struct(lit("hub_null_business_keys").as("test_type"), col("n_null").as("n_failures")),
        struct(lit("orphaned_satellite_customer").as("test_type"), col("orphan_sat").as("n_failures")),
        struct(lit("orphaned_link_customer_ref").as("test_type"), col("orphan_link_cust").as("n_failures")),
        struct(lit("orphaned_link_order_ref").as("test_type"), col("orphan_link_order").as("n_failures")),
        struct(lit("duplicate_hub_hash_key").as("test_type"), col("dup_hub").as("n_failures")),
        struct(lit("duplicate_link_hash_key").as("test_type"), col("dup_link").as("n_failures")))).as("t"))
      .select(col("t.test_type").as("test_type"), col("t.n_failures").as("n_failures"))
  }

  def vaultModelOracle: String =
    """SELECT
      |  md5(concat_ws(chr(1),
      |    coalesce(CAST(o_orderkey AS VARCHAR), chr(2)),
      |    coalesce(CAST(o_custkey AS VARCHAR), chr(2)))) AS link_order_customer_hk,
      |  md5(coalesce(CAST(o_orderkey AS VARCHAR), chr(2))) AS order_hk,
      |  md5(coalesce(CAST(o_custkey AS VARCHAR), chr(2))) AS customer_hk,
      |  o_orderkey AS order_key,
      |  o_custkey AS customer_key,
      |  md5(concat_ws(chr(1),
      |    coalesce(CAST(o_orderstatus AS VARCHAR), chr(2)),
      |    coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), chr(2)),
      |    coalesce(CAST(o_orderpriority AS VARCHAR), chr(2)))) AS sat_order_hashdiff,
      |  o_orderstatus AS order_status,
      |  o_orderpriority AS order_priority
      |FROM orders""".stripMargin

  def vaultIntegrityOracle: String =
    """WITH link AS (
      |  SELECT md5(concat_ws(chr(1), CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR))) AS link_hk,
      |    md5(CAST(o_orderkey AS VARCHAR)) AS order_hk,
      |    md5(CAST(o_custkey AS VARCHAR)) AS customer_hk
      |  FROM orders
      |), hub_c AS (
      |  SELECT md5(CAST(c_custkey AS VARCHAR)) AS customer_hk, c_custkey
      |  FROM customer WHERE c_custkey % 10 != 3
      |), hub_o AS (
      |  SELECT md5(CAST(o_orderkey AS VARCHAR)) AS order_hk FROM orders
      |), sat_c AS (
      |  SELECT md5(CAST(c_custkey AS VARCHAR)) AS customer_hk FROM customer
      |)
      |SELECT 'hub_null_business_keys' AS test_type,
      |  CAST((SELECT COUNT(*) FROM hub_c WHERE c_custkey IS NULL) AS BIGINT) AS n_failures
      |UNION ALL
      |SELECT 'orphaned_satellite_customer',
      |  CAST((SELECT COUNT(*) FROM sat_c WHERE customer_hk NOT IN (SELECT customer_hk FROM hub_c)) AS BIGINT)
      |UNION ALL
      |SELECT 'orphaned_link_customer_ref',
      |  CAST((SELECT COUNT(*) FROM link WHERE customer_hk NOT IN (SELECT customer_hk FROM hub_c)) AS BIGINT)
      |UNION ALL
      |SELECT 'orphaned_link_order_ref',
      |  CAST((SELECT COUNT(*) FROM link WHERE order_hk NOT IN (SELECT order_hk FROM hub_o)) AS BIGINT)
      |UNION ALL
      |SELECT 'duplicate_hub_hash_key',
      |  CAST((SELECT COUNT(*) FROM (SELECT customer_hk FROM hub_c GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)
      |UNION ALL
      |SELECT 'duplicate_link_hash_key',
      |  CAST((SELECT COUNT(*) FROM (SELECT link_hk FROM link GROUP BY 1 HAVING COUNT(*) > 1)) AS BIGINT)""".stripMargin
}
