package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema build: dim_date generation, conformed dims with surrogate
  * keys, and the fact join (reference: src/etl/gold/star_schema_builder.py:96-345,
  * joins at 571-614).
  *
  * Surrogate keys are md5 of the natural key — deterministic and computable
  * distributed (the reference's sequential surrogate IDs would need a global
  * ordering; content-hash keys need nothing). dim_date attributes are pure
  * date arithmetic over a generated day sequence.
  */
object StarSchema {

  /** Calendar dimension spanning [min(o_orderdate), max(o_orderdate)]
    * (reference: star_schema_builder.py:96-160). The min/max is a 1-row
    * aggregate collected to the driver; the day range is exploded
    * distributed. */
  def dimDate(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.orders(spark, dir)
      .agg(min(to_date(col("o_orderdate"))).as("mn"), max(to_date(col("o_orderdate"))).as("mx"))
      .collect()(0)
    val (mn, mx) = (bounds.getDate(0), bounds.getDate(1))
    spark.range(1).select(
        explode(sequence(lit(mn), lit(mx), expr("interval 1 day"))).as("d"))
      .select(
        ((year(col("d")) * 10000) + (month(col("d")) * 100) + dayofmonth(col("d")))
          .cast("long").as("date_key"),
        col("d").as("date"),
        year(col("d")).cast("long").as("year"),
        quarter(col("d")).cast("long").as("quarter"),
        month(col("d")).cast("long").as("month"),
        dayofmonth(col("d")).cast("long").as("day"),
        date_format(col("d"), "EEEE").as("day_name"),
        date_format(col("d"), "MMMM").as("month_name"),
        dayofweek(col("d")).isin(1, 7).as("is_weekend"),
        trunc(col("d"), "MM").as("first_day_of_month"))
  }

  /** Line-grain fact with surrogate FKs and conformed attributes
    * (reference: star_schema_builder.py:299-345). Join strategy: lineitem⋈
    * orders and ⋈customer/⋈part/⋈supplier are key-shuffle joins (all sides
    * scale with SF); nation⋈region is broadcast (constant size). AQE may
    * still elect broadcast for the smaller dims at low SF — both plans are
    * correct. */
  def factSales(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    val geo = broadcast(n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey").as("g_nationkey"), col("n_name").as("country"), col("r_name").as("region")))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey", "c_mktsegment")
      .join(geo, col("c_nationkey") === col("g_nationkey"))
      .select("c_custkey", "c_mktsegment", "country", "region")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_type")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")

    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(p, l("l_partkey") === p("p_partkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        md5(col("o_custkey").cast("string")).as("customer_sk"),
        md5(col("l_partkey").cast("string")).as("part_sk"),
        md5(col("l_suppkey").cast("string")).as("supplier_sk"),
        ((year(col("o_orderdate")) * 10000) + (month(col("o_orderdate")) * 100)
          + dayofmonth(col("o_orderdate"))).cast("long").as("date_key"),
        col("country"), col("region"), col("c_mktsegment"),
        col("p_brand"), col("s_name"), col("o_orderpriority"),
        col("l_quantity"),
        col("l_extendedprice"),
        (col("l_extendedprice") * col("l_discount")).as("discount_amount"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * col("l_tax")).as("tax_amount"))
  }
}
