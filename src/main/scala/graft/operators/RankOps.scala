package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking / NTILE.
  *
  * The reference scores RFM with `Window.orderBy(...)` and **no partition**
  * (reference: src/etl/gold/spark_gold.py:114-116) — Spark collapses that to a
  * single-partition sort, the classic scale-killer. Here a global rank is
  * computed with a range repartition on the sort key (a distributed sort),
  * per-partition row numbers, and driver-side partition offsets — the only
  * driver data is one row per partition (~#shuffle-partitions rows), so the
  * same code runs at 100 TB.
  *
  * `withGlobalNtile` then applies the exact SQL NTILE bucket formula, so the
  * result matches `NTILE(k) OVER (ORDER BY …)` bit-for-bit — the sort keys
  * must be a total order (callers append a unique tie-breaker).
  */
object RankOps {

  /** Adds `rankCol` = 1-based global row_number under `sortCols` ordering.
    * Returns (df, totalCount).
    *
    * The range-shuffled frame is `localCheckpoint`ed, not merely cached:
    * the offsets collected here are only valid for the exact partition
    * boundaries the range sampler drew, and a cache-evicted recompute could
    * draw different ones — silent rank corruption. Checkpointing cuts the
    * lineage, so losing the blocks fails the job loudly instead. Blocks are
    * freed by the ContextCleaner once the frame is unreferenced;
    * Verify/Bench also clearCache between queries. */
  def withGlobalRankCounted(df: DataFrame, rankCol: String, sortCols: Seq[Column],
                            numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, sortCols: _*).localCheckpoint(false)
    val counts = ranged
      .groupBy(spark_partition_id().as("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val row = (pid, acc); acc += c; row }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val ranked = ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(w))
      .join(offDf, "__pid")
      .withColumn(rankCol, (col("__rn") + col("__offset")).cast("long"))
      .drop("__pid", "__rn", "__offset")
    (ranked, total)
  }

  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Seq[Column]): DataFrame =
    withGlobalRankCounted(df, rankCol, sortCols)._1

  /** Adds `cumCol` = exact `SUM(valueCol) OVER (ORDER BY sortCols ROWS
    * UNBOUNDED PRECEDING)` (long) — the distributed twin of the global-rank
    * trick: range repartition on the sort key, per-partition running sums,
    * and ≤ #partitions driver-side sum offsets. `valueCol` must be integral
    * (long addition is associative — partial sums cannot drift). */
  def withGlobalCumSum(df: DataFrame, cumCol: String, valueCol: Column,
                       sortCols: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint for the same reason as withGlobalRankCounted: the
    // offsets are only valid for the exact range boundaries drawn here
    val ranged = df.withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, sortCols: _*).localCheckpoint(false)
    val sums = ranged
      .groupBy(spark_partition_id().as("__pid")).agg(sum(col("__v")).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val row = (pid, acc); acc += s; row }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__coff"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__pid", spark_partition_id())
      .withColumn("__crn", sum(col("__v")).over(w))
      .join(offDf, "__pid")
      .withColumn(cumCol, (col("__crn") + col("__coff")).cast("long"))
      .drop("__pid", "__crn", "__coff", "__v")
  }

  /** Adds `ntileCol` = exact `NTILE(k) OVER (ORDER BY sortCols)` (long). */
  def withGlobalNtile(df: DataFrame, ntileCol: String, k: Int, sortCols: Seq[Column]): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    val (ranked, n) = withGlobalRankCounted(df, "__grank", sortCols)
    val q = n / k // base bucket size
    val r = n % k // first r buckets get one extra row
    val rank = col("__grank")
    val bucket =
      if (q == 0) rank // fewer rows than buckets: row i -> bucket i
      else if (r == 0) (rank - 1) / lit(q) + 1
      else
        when(rank <= lit((q + 1) * r), (rank - 1) / lit(q + 1) + 1)
          .otherwise(lit(r) + (rank - 1 - lit(r * (q + 1))) / lit(q) + 1)
    // integer division: operands are longs; use floor to force integral result
    ranked.withColumn(ntileCol, floor(bucket).cast("long")).drop("__grank")
  }
}
