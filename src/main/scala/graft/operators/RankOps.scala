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

  /** Ceiling for frames that ride an UNPARTITIONED window because they are
    * calendar/bucket-bounded (daily series, monthly rollups, KPI buckets):
    * ~550 years of days — far above any real calendar frame, far below any
    * data-proportional one. */
  val MaxBoundedFrame = 200000L

  /** Guard rail for unpartitioned-window expressions whose legality rests
    * on the frame being calendar/bucket-bounded: wraps a CONSUMED window
    * column so the plan raises at execution — distributed, no extra job —
    * if the frame exceeds `maxRows` (i.e. someone fed a data-proportional
    * frame to a bounded-frame operator). Within the bound the value is
    * `inner` unchanged, so oracles are unaffected. Wrapping a consumed
    * column (not adding a side column) is what keeps the optimizer's
    * column pruning from silently deleting the check. */
  def boundedFrame(what: String, inner: Column,
                   maxRows: Long = MaxBoundedFrame): Column =
    when(count(lit(1)).over(Window.partitionBy()) > maxRows,
      raise_error(lit(s"bounded-frame guard '$what': unpartitioned window " +
        s"frame exceeded $maxRows rows — the input is data-proportional, " +
        "not calendar/bucket-bounded")))
      .otherwise(inner)

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

  /** Adds `rankCol` = 1-based `row_number() OVER (PARTITION BY groupCols
    * ORDER BY sortCols)` (long) without ever sorting a whole group in one
    * task.
    *
    * Why: a bare `Window.partitionBy(group)` yields exactly #groups tasks —
    * a parallelism ceiling when groups are few and huge (25 countries over
    * 20M+ ranked parts at 100 TB means 25 tasks sorting ~1M rows each).
    * Here the frame is range-partitioned on (groupCols ++ sortCols) — a
    * distributed sort in which each group's rows occupy CONSECUTIVE
    * partitions — so a per-(partition, group) row number plus the count of
    * rows the same group placed in earlier partitions is exactly the
    * per-group rank. Those boundary offsets are nonzero only where a group
    * spans a partition boundary — at most #partitions − 1 rows no matter how
    * many groups or rows — so the offset frame is computed distributively (a
    * running-sum window over the per-(pid, group) count frame, whose
    * per-group slices are ≤ #partitions rows each) and broadcast back. No
    * driver collect anywhere, and nothing in the plan scales with #groups or
    * group size.
    *
    * `countCol`, if set, also adds the per-group total row count via a
    * broadcast of the ≤ #groups-row totals frame — ask for it only when the
    * group cardinality is itself broadcast-sized (the median-rank use case;
    * segment/country-grade cardinalities, not part-grade).
    *
    * The range-shuffled frame is localCheckpoint'ed for the same reason as
    * [[withGlobalRankCounted]]: the per-partition counts are only valid for
    * the exact boundaries the range sampler drew. `sortCols` must
    * total-order rows within a group (callers append a unique tie-breaker).
    * Group columns are compared null-safely (`<=>`), so null groups rank
    * like any other group. */
  def withGroupedRank(df: DataFrame, rankCol: String, groupCols: Seq[String],
                      sortCols: Seq[Column], numPartitions: Int = 0,
                      countCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "withGroupedRank needs at least one group column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val gCols = groupCols.map(col)
    val ranged = df.repartitionByRange(parts, gCols ++ sortCols: _*).localCheckpoint(false)
    val withPid = ranged.withColumn("__pid", spark_partition_id())
    // one row per (partition, group) present — ≤ #partitions + #groups rows,
    // contiguous groups ⇒ each partition holds a short group slice
    val counts = withPid.groupBy(col("__pid") +: gCols: _*).agg(count(lit(1)).as("__cnt"))
    // rows this group placed in EARLIER partitions; > 0 only at boundary
    // spans (≤ #partitions − 1 rows survive the filter ⇒ always broadcastable)
    val wOff = Window.partitionBy(gCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offCond = ((col("__pid") === col("__opid")) +:
      groupCols.map(c => col(c) <=> col(s"__og_$c"))).reduce(_ && _)
    val wRank = Window.partitionBy(col("__pid") +: gCols: _*).orderBy(sortCols: _*)
    val internal = "__pid" :: "__rn" :: "__opid" :: "__goff" ::
      groupCols.map(c => s"__og_$c").toList
    countCol match {
      case None =>
        // broadcast ONLY the boundary-spanning rows (≤ #partitions − 1, no
        // matter how many groups) — group cardinality never enters the plan
        val offsets = counts
          .withColumn("__goff", sum(col("__cnt")).over(wOff))
          .filter(col("__goff").isNotNull && col("__goff") > 0)
          .select(col("__pid").as("__opid") +:
            groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__goff"): _*)
        withPid
          .withColumn("__rn", row_number().over(wRank))
          .join(broadcast(offsets), offCond, "left")
          .withColumn(rankCol, (col("__rn") + coalesce(col("__goff"), lit(0L))).cast("long"))
          .drop(internal: _*)
      case Some(cc) =>
        // countCol implies broadcast-sized group cardinality, so ship offset
        // AND group total in ONE auxiliary broadcast (≤ #groups + #partitions
        // rows) — one join instead of two
        // same partition+order as wOff (only the frame differs) so both
        // sums share one Window sort of the tiny counts frame
        val wTot = Window.partitionBy(gCols: _*).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val aux = counts
          .withColumn("__goff", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
          .withColumn("__gtot", sum(col("__cnt")).over(wTot).cast("long"))
          .select((col("__pid").as("__opid") +:
            groupCols.map(c => col(c).as(s"__og_$c"))) ++
            Seq(col("__goff"), col("__gtot")): _*)
        withPid
          .withColumn("__rn", row_number().over(wRank))
          .join(broadcast(aux), offCond, "inner") // every (pid, group) is in counts
          .withColumn(rankCol, (col("__rn") + col("__goff")).cast("long"))
          .withColumn(cc, col("__gtot"))
          .drop("__gtot" :: internal: _*)
    }
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
