package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time training-set assembly (reference:
  * src/ml/feature_engineering/feature_store.py:440-489 `get_features` —
  * "latest feature record with timestamp <= t" per entity — and
  * `get_features_batch`:491-523, which retrieves a training batch by looping
  * entities one service query at a time). Here the entire batch is ONE
  * distributed as-of join through the native custom-plan operator
  * (graft.plans.NativeAsOf: one hash exchange per side, streaming merge,
  * O(1) state per key) — the feature-store query semantics with no serving
  * infrastructure, leak-free by construction: every feature value a row sees
  * was computed strictly from orders at or before that row's event time.
  *
  * Feature snapshots are end-of-day cumulative customer history (order
  * count, lifetime spend in exact cents) — one shuffle on the customer key
  * serves both running windows and the per-day keep-latest dedup (the
  * (cust, day) clustering is a superset of the cust hash partitioning, so
  * Catalyst plans a single exchange). The event spine carries event_type as
  * the supervised label.
  */
object FeatureStore {

  /** (event spine ⨝asof feature snapshots): one row per event with the
    * customer's feature vector as of the event timestamp; events from
    * customers with no prior order keep NULL features (left as-of). */
  def trainingMatrix(spark: SparkSession, dir: String): DataFrame = {
    val wRun = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wDay = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val snaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .withColumn("f_order_count", row_number().over(wRun).cast("long"))
      .withColumn("f_cum_spend_cents",
        sum(col("cents")).over(wRun.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(wDay))
      .filter(col("__rn") === 1)
      .select(col("o_custkey"), col("o_orderdate"),
        col("f_order_count"), col("f_cum_spend_cents"))
      .withColumn("__rt", col("o_orderdate").cast("timestamp"))

    val spine = Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type")

    graft.plans.NativeAsOf.asofJoin(spine, snaps,
        "user_id", "o_custkey", "ts", "__rt",
        Seq("f_order_count", "f_cum_spend_cents", "o_orderdate"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("event_type").as("label"),
        col("matched_f_order_count").as("f_order_count"),
        col("matched_f_cum_spend_cents").as("f_cum_spend_cents"),
        to_date(col("matched_o_orderdate")).as("f_last_order_date"),
        datediff(to_date(col("ts")), to_date(col("matched_o_orderdate")))
          .cast("long").as("f_days_since_last_order"))
  }

  /** DuckDB oracle mirroring trainingMatrix (native ASOF LEFT JOIN; QUALIFY
    * filters after the running windows compute, matching the Spark order). */
  def trainingMatrixOracle: String =
    """WITH snaps AS (
      |  SELECT o_custkey, o_orderdate,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS f_order_count,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
      |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f_cum_spend_cents
      |  FROM orders
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
      |    ORDER BY o_orderkey DESC) = 1
      |)
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
      |  event_type AS label,
      |  f_order_count, f_cum_spend_cents,
      |  CAST(o_orderdate AS DATE) AS f_last_order_date,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(ts AS DATE)) AS BIGINT)
      |    AS f_days_since_last_order
      |FROM events ASOF LEFT JOIN snaps
      |  ON user_id = o_custkey AND ts >= o_orderdate""".stripMargin
}
