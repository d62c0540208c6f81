package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively, built by
  * composing existing operators (preference tier (a) of the brief): tag both
  * sides, union, and carry the last right-side payload forward over a
  * per-key event-time window. One shuffle on the key, no per-row range
  * probing, no key explosion — the canonical scalable Spark shape. DuckDB's
  * native `ASOF JOIN` is the oracle.
  */
object AsOf {

  /** For each left row, attach the most recent right row of the same key
    * with rightTime <= leftTime. Right side must be unique per
    * (key, rightTime) — pre-dedup upstream (ties would be nondeterministic
    * in any engine). Right rows with a NULL key or NULL rightTime are
    * dropped up front: a NULL-time row would sort first (asc = nulls first)
    * and its payload would be carried onto left rows that have no real
    * prior match — no sane as-of semantics (nor DuckDB's ASOF) matches
    * NULL-time rows. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // keys keep their native type (casting to long would NULL-collapse
    // string keys into one window partition — silent corruption)
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__rpay", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightPayload.map(p => right.schema(p)))))
    // the whole payload rides as ONE struct so every matched_* column comes
    // from the same right row (per-column last(ignoreNulls) would stitch
    // fields from different rows when payload columns are null)
    val r0 = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime).cast("timestamp"))
      .withColumn("__side", lit(0))
      .withColumn("__rpay", struct(rightPayload.map(col): _*))
    val rAligned = leftCols.foldLeft(r0)((d, c) =>
      if (r0.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val cols = leftCols.map(col) ++ Seq(col("__key"), col("__t"), col("__side"), col("__rpay"))
    val unioned = l.select(cols: _*).unionByName(rAligned.select(cols: _*))

    // right rows sort before left rows at equal time → `>=` match semantics
    val w = Window.partitionBy(col("__key")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightPayload.map(p => col(s"__matched.$p").as(s"matched_$p"))): _*)
  }

  /** Same query as [[eventsAsofOrders]] but through the native custom-plan
    * operator (graft.plans.NativeAsOf: LogicalPlan + Strategy + SparkPlan)
    * instead of the union+window composition — one hash exchange per side,
    * streaming merge, O(1) state. Shares the DuckDB ASOF JOIN oracle. */
  def eventsAsofOrdersNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_id", "user_id", "ts", "event_type")
    val wDedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val o = Tables.orders(spark, dir)
      .withColumn("__rn", row_number().over(wDedup)).filter(col("__rn") === 1).drop("__rn")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("__rt", col("o_orderdate").cast("timestamp")) // align time types
    graft.plans.NativeAsOf.asofJoin(e, o, "user_id", "o_custkey", "ts", "__rt",
      Seq("o_orderkey", "o_totalprice", "o_orderdate"))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("matched_o_orderkey"), col("matched_o_totalprice"),
        to_date(col("matched_o_orderdate")).as("matched_order_date"))
  }

  /** events ⨝asof orders: each event picks the customer's latest order at or
    * before the event time (orders deduped to one per customer × day,
    * highest order key — the same tie rule the oracle applies). */
  def eventsAsofOrders(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select("event_id", "user_id", "ts", "event_type")
    val wDedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val o = Tables.orders(spark, dir)
      .withColumn("__rn", row_number().over(wDedup)).filter(col("__rn") === 1).drop("__rn")
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    asofJoin(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice", "o_orderdate"))
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("matched_o_orderkey"), col("matched_o_totalprice"),
        to_date(col("matched_o_orderdate")).as("matched_order_date"))
  }
}
