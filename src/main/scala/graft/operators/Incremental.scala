package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-processing operators (reference:
  * src/etl/incremental/incremental_etl_processor.py — HighWaterMarkManager,
  * ChangeDetector's timestamp / checksum / basic strategies).
  *
  * The reference iterates pandas rows to build ChangeRecord objects
  * (incremental_etl_processor.py:180-384); here each strategy is one
  * declarative plan: the watermark extract is a pushed-down timestamp filter
  * plus a broadcast 1-row aggregate (no shuffle of the extracted data), and
  * the snapshot diff is a single full-outer join on the business key
  * comparing md5 row checksums — delete detection included, which the
  * left-join-only Quality.detectChanges deliberately omits.
  */
object Incremental {

  /** Rows strictly after `watermark` plus the batch's new high-water mark
    * (max event time of the extracted slice) on every row. The filter pushes
    * into the scan; the 1-row max is broadcast back — the extracted slice
    * itself is never shuffled. */
  def extractSince(df: DataFrame, tsCol: String, watermark: String): DataFrame = {
    val slice = df.filter(col(tsCol) > lit(watermark).cast("timestamp"))
    val wm = slice.agg(date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("new_watermark"))
    slice.crossJoin(broadcast(wm))
  }

  /** md5 row checksum over the tracked columns — chr(1) field separator,
    * chr(2) null sentinel (both reproducible in DuckDB; the reference's
    * row-dict md5 at incremental_etl_processor.py:126-137 is the same idea). */
  private def rowHash(tracked: Seq[String]) =
    md5(concat_ws("\u0001", tracked.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** Checksum snapshot diff: one full-outer join of current vs incoming on
    * the business keys → insert / update / delete / no_change per key
    * (reference `_detect_basic_changes` + `_detect_checksum_changes`). */
  def snapshotDiff(current: DataFrame, incoming: DataFrame,
                   keys: Seq[String], tracked: Seq[String]): DataFrame = {
    val cur = current.select(keys.map(col) :+ rowHash(tracked).as("current_hash"): _*).as("c")
    val inc = incoming.select(keys.map(col) :+ rowHash(tracked).as("incoming_hash"): _*).as("i")
    cur.join(inc, keys.map(k => col(s"c.$k") <=> col(s"i.$k")).reduce(_ && _), "full_outer")
      .select(
        keys.map(k => coalesce(col(s"c.$k"), col(s"i.$k")).as(k)) ++ Seq(
          col("current_hash"), col("incoming_hash"),
          when(col("current_hash").isNull, "insert")
            .when(col("incoming_hash").isNull, "delete")
            .when(col("current_hash") =!= col("incoming_hash"), "update")
            .otherwise("no_change").as("change_type")): _*)
  }

  /** Driver query: watermark extract over events (watermark mid-range so
    * both kept and dropped rows exist). props excluded: raw json passthrough
    * is events_json's job. */
  def incrementalEvents(spark: SparkSession, dir: String): DataFrame =
    extractSince(Tables.events(spark, dir), "ts", "2024-01-20 00:00:00")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        col("new_watermark"))

  /** Driver query: snapshot diff over the same synthetic customer pair the
    * SCD2 merge uses (inserts at key%10=3, deletes at key%10=7, updates at
    * key%5=0 / key%11=0). */
  def snapshotDiffCustomers(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val current = base.filter(col("c_custkey") % 10 =!= 3)
    val incoming = base.filter(col("c_custkey") % 10 =!= 7)
      .withColumn("c_mktsegment",
        when(col("c_custkey") % 5 === 0, lit("UPGRADED")).otherwise(col("c_mktsegment")))
      .withColumn("c_nationkey",
        when(col("c_custkey") % 11 === 0, ((col("c_nationkey") + 1) % 25).cast("int"))
          .otherwise(col("c_nationkey")))
    snapshotDiff(current, incoming,
      keys = Seq("c_custkey"), tracked = Seq("c_mktsegment", "c_nationkey"))
  }
}
