package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout for co-located joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the join
  * key lets every subsequent join run bucket-aware: no exchange, no sort —
  * at 100 TB that's the difference between an hourly pipeline re-shuffling
  * the fact table every run and reading it join-ready. Bucket count should
  * approximate (table size / target partition size); both tables must use
  * the same count for exchange-free joins.
  */
object Bucketed {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The physical plan
    * contains no Exchange for either side (verify with
    * `.queryExecution.executedPlan`). */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** The order-priority revenue rollup computed the naive way: lineitem ⋈
    * orders from raw parquet — the join shuffles BOTH sides on the key every
    * run. Benched as the control of the bucketed/shuffled pair. */
  def factJoinShuffled(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    revenueRollup(l.join(o, "o_orderkey"))
  }

  /** The same rollup over pre-bucketed tables: both sides written bucketed +
    * sorted by the join key, so every subsequent run joins exchange-free —
    * the recurring-pipeline layout a 100 TB star schema wants. The one-time
    * bucketed write happens on first use per session/dir (first bench run
    * pays it; the per-query median reflects the steady state). */
  def factJoinBucketed(spark: SparkSession, dir: String, buckets: Int = 16): DataFrame = {
    // table names are scoped per PROCESS (pid tag): two JVMs sharing one
    // warehouse (bench + tests) otherwise race — each, seeing no catalog
    // entry, would delete the other's live bucketed directory mid-run
    val tag = s"${java.lang.Integer.toHexString(dir.hashCode)}_${ProcessHandle.current().pid()}"
    val (lt, ot) = (s"b_lineitem_$tag", s"b_orders_$tag")
    sweepDeadIncarnations(spark)
    if (!spark.catalog.tableExists(lt)) {
      dropStaleLocation(spark, lt)
      writeBucketed(Tables.lineitem(spark, dir).select(
        col("l_orderkey").as("o_orderkey"), col("l_extendedprice"), col("l_discount")),
        lt, "o_orderkey", buckets)
    }
    if (!spark.catalog.tableExists(ot)) {
      dropStaleLocation(spark, ot)
      writeBucketed(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        ot, "o_orderkey", buckets)
    }
    revenueRollup(bucketJoin(spark, lt, ot, "o_orderkey"))
  }

  /** The in-memory catalog forgets tables across JVMs but their warehouse
    * directories survive, and saveAsTable refuses to reuse the location —
    * clear a leftover dir for a table the catalog no longer knows. Safe
    * against concurrent JVMs because table names carry the pid: a leftover
    * dir under OUR name can only be a dead prior incarnation's. */
  /** Pid-scoped table names fix the cross-JVM delete race but leave each dead
    * JVM's bucketed copy of lineitem+orders on disk forever. Sweep, once per
    * JVM, every warehouse dir matching our naming scheme whose pid suffix no
    * longer names a live process — a dead incarnation's dir can have no
    * reader. Live pids (ours or a concurrent bench/test JVM's) are untouched. */
  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val BucketedDir = "b_(?:lineitem|orders)_[0-9a-f]+_([0-9]+)".r

  private def sweepDeadIncarnations(spark: SparkSession): Unit =
    if (swept.compareAndSet(false, true)) {
      val warehouse = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.listStatus(warehouse).foreach { st =>
        st.getPath.getName match {
          case BucketedDir(pid) =>
            val alive = ProcessHandle.of(pid.toLong)
              .map[java.lang.Boolean](_.isAlive).orElse(java.lang.Boolean.FALSE)
            if (!alive) fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }

  private def dropStaleLocation(spark: SparkSession, table: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  private def revenueRollup(joined: DataFrame): DataFrame =
    joined.groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_lines"),
        graft.Exact.dec6ToDouble(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,6)"))
        ).as("revenue"))
}
