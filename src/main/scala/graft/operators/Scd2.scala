package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 validity windows + hash change detection
  * (reference: src/etl/transformations/windowing.py:94-108 and scd2.py:24).
  *
  * Orders act as the customer-attribute change stream: each order is a
  * "version" of the customer's (status, priority) attributes. Windows are
  * partitioned by the business key — never a global sort — and ordered with a
  * unique tie-breaker. The attribute hash is md5 (identical on Spark and
  * DuckDB) rather than Spark-internal `hash` which the reference uses
  * (windowing.py:376-379) and which nothing else can reproduce.
  */
object Scd2 {

  /** Incremental SCD2 merge-apply (reference: src/etl/transformations/scd2.py:68-252):
    * `(currentDim, incoming, keys, tracked) → updated dim`, closing changed and
    * deleted versions and inserting new ones.
    *
    * Spark-first shape: ONE full-outer shuffle join of the current slice
    * against the incoming snapshot on the business keys, then a single
    * projection that emits 1-or-2 output rows per joined row via an
    * array-of-structs + `explode` (a changed key yields both the closed old
    * version and the opened new one). No driver loops, no per-branch join
    * recompute — the reference's pandas row-iteration (scd2.py:96-114) becomes
    * a null-safe `<=>` disjunction over the tracked columns. History rows
    * (`is_current = false`) pass through untouched.
    *
    * `current` must carry `effective_date`/`end_date` (DATE) and `is_current`
    * (BOOLEAN); `incoming` carries keys ++ attribute columns. Unchanged rows
    * keep the EXISTING attribute values (scd2.py:187-199): untracked drift
    * does not open a version.
    */
  def merge(
      current: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      tracked: Seq[String],
      effectiveDate: String,
      defaultEndDate: String = "9999-12-31"): DataFrame = {
    val scdCols = Seq("effective_date", "end_date", "is_current")
    val attrs = current.columns.toSeq.filterNot(c => keys.contains(c) || scdCols.contains(c))
    val eff = to_date(lit(effectiveDate))
    val defEnd = to_date(lit(defaultEndDate))

    val cur = current.filter(col("is_current")).withColumn("_c", lit(true)).as("c")
    val inc = incoming.withColumn("_i", lit(true)).as("i")
    val joined = cur.join(inc, keys.map(k => col(s"c.$k") <=> col(s"i.$k")).reduce(_ && _), "full_outer")

    val changed = tracked.map(t => !(col(s"c.$t") <=> col(s"i.$t"))).reduce(_ || _)
    val outFields = keys ++ attrs ++ scdCols :+ "change_type"

    def fromCur(endDate: Column, isCur: Column, ctype: String): Column = struct(
      keys.map(k => col(s"c.$k").as(k)) ++ attrs.map(a => col(s"c.$a").as(a)) ++ Seq(
        col("c.effective_date").as("effective_date"), endDate.as("end_date"),
        isCur.as("is_current"), lit(ctype).as("change_type")): _*)
    def fromInc(ctype: String): Column = struct(
      keys.map(k => col(s"i.$k").as(k)) ++ attrs.map(a => col(s"i.$a").as(a)) ++ Seq(
        eff.as("effective_date"), defEnd.as("end_date"),
        lit(true).as("is_current"), lit(ctype).as("change_type")): _*)

    val emitted = joined
      .withColumn("_out",
        when(col("_c").isNotNull && col("_i").isNotNull && !changed,
          array(fromCur(col("c.end_date"), lit(true), "unchanged")))
        .when(col("_c").isNotNull && col("_i").isNotNull,
          array(fromCur(eff, lit(false), "closed"), fromInc("new_version")))
        .when(col("_c").isNull, array(fromInc("insert")))
        .otherwise(array(fromCur(eff, lit(false), "delete"))))
      .select(explode(col("_out")).as("s"))
      .select(outFields.map(f => col(s"s.$f")): _*)

    val history = current.filter(!col("is_current"))
      .withColumn("change_type", lit("history"))
      .select(outFields.map(col): _*)
    emitted.unionByName(history)
  }

  /** Driver query: deterministic dim/incoming pair synthesized from
    * `customer` so every merge case fires — inserts (key%10=3 absent from the
    * dim), deletes (key%10=7 absent from incoming), tracked updates
    * (segment rewrite at key%5=0, nation shift at key%11=0), history
    * passthrough (closed LEGACY rows at key%20=1). */
  def scd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val cur = base.filter(col("c_custkey") % 10 =!= 3)
      .withColumn("effective_date", to_date(lit("1995-01-01")))
      .withColumn("end_date", to_date(lit("9999-12-31")))
      .withColumn("is_current", lit(true))
    val hist = base.filter(col("c_custkey") % 20 === 1)
      .withColumn("c_mktsegment", lit("LEGACY"))
      .withColumn("effective_date", to_date(lit("1992-01-01")))
      .withColumn("end_date", to_date(lit("1995-01-01")))
      .withColumn("is_current", lit(false))
    val incoming = base.filter(col("c_custkey") % 10 =!= 7)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 5 === 0, lit("UPGRADED")).otherwise(col("c_mktsegment")))
      .withColumn("c_nationkey",
        when(col("c_custkey") % 11 === 0, ((col("c_nationkey") + 1) % 25).cast("int"))
          .otherwise(col("c_nationkey")))
    merge(cur.unionByName(hist), incoming,
      keys = Seq("c_custkey"), tracked = Seq("c_mktsegment", "c_nationkey"),
      effectiveDate = "1998-01-01")
  }

  def scd2Customer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("customer_id")).orderBy(col("valid_from"), col("o_orderkey"))
    val wDesc = Window.partitionBy(col("customer_id")).orderBy(col("valid_from").desc, col("o_orderkey").desc)
    o.select(
        col("o_custkey").as("customer_id"),
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("valid_from"),
        md5(concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))).as("attribute_hash"))
      .withColumn("prev_hash", lag(col("attribute_hash"), 1).over(w))
      .withColumn("next_valid_from", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", row_number().over(wDesc) === 1)
      .withColumn("valid_to",
        when(col("is_current"), lit(null).cast("date")).otherwise(col("next_valid_from")))
      .withColumn("change_type",
        when(col("prev_hash").isNull, "insert")
          .when(col("prev_hash") =!= col("attribute_hash"), "update")
          .otherwise("no_change"))
      .drop("next_valid_from")
  }
}
