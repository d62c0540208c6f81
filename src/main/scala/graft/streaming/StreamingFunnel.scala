package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming conversion funnel — the stateful-incremental form of
  * [[graft.operators.Funnel.eventFunnel]]: per-user step-time state
  * (t1..t4) evolved one ts-ordered micro-batch at a time with the
  * exactly-once write-then-mark sink, answered as the SAME 4-row summary.
  * The classic hard streaming-analytics problem (strictly-ordered
  * multi-step state), closed the way the other streaming arcs were
  * (neardup / hybrid / IVF-append): batch-boundary invariance lets the
  * replay ride the BATCH oracle verbatim.
  *
  * WHY batch boundaries cannot change the answer: ingest is ts-ordered
  * (the replay bands events by global (ts, event_id) rank — in production,
  * an event-time-sorted log with a watermark barrier), and every step time
  * is a MONOTONE min over an append-only prefix: once t_k is set, no
  * later-ts event can lower it, and a step-k candidate's qualifying
  * condition (`ts > t_{k-1}`) only references state from strictly earlier
  * positions. So folding the cascade per batch — seeding each batch's
  * running windows with the prior state via null-skipping `least` — lands
  * on exactly the timestamps the one-shot cascade computes, wherever the
  * boundaries fall (spec-pinned against the batch path, 1/2/4/7 batches).
  *
  * Scale shape: state is one row per ACTIVE user (bounded by users, not
  * events); each micro-batch costs one user-keyed window pass over the
  * batch + one outer merge with the state — the
  * mapGroupsWithState cost model expressed as replayable DataFrame ops. */
object StreamingFunnel {

  private val StepTypes = Seq("view", "click", "signup", "purchase")

  private def emptyState(spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t1",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("t2",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("t3",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("t4",
        org.apache.spark.sql.types.TimestampType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Fold one ts-ordered micro-batch into the per-user state. Events must
    * not precede (in (ts, event_id) order) anything already folded — the
    * ts-ordered-ingest contract that makes the state monotone. */
  private[graft] def advance(prior: DataFrame, events: DataFrame): DataFrame = {
    val ev = events.filter(col("event_type").isin(StepTypes: _*))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val pj = ev.join(
      prior.select(col("user_id"), col("t1").as("p1"), col("t2").as("p2"),
        col("t3").as("p3"), col("t4").as("p4")),
      Seq("user_id"), "left")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the batch cascade seeded with prior state: least() skips nulls, and
    // prior times come from strictly earlier stream positions
    val x1 = pj.withColumn("__r1",
      least(col("p1"), min(when(col("event_type") === "view", col("ts"))).over(w)))
    val x2 = x1
      .withColumn("__q2",
        when(col("event_type") === "click" && col("ts") > col("__r1"), col("ts")))
      .withColumn("__r2", least(col("p2"), min(col("__q2")).over(w)))
    val x3 = x2
      .withColumn("__q3",
        when(col("event_type") === "signup" && col("ts") > col("__r2"), col("ts")))
      .withColumn("__r3", least(col("p3"), min(col("__q3")).over(w)))
    val x4 = x3
      .withColumn("__q4",
        when(col("event_type") === "purchase" && col("ts") > col("__r3"), col("ts")))
    val touched = x4.groupBy("user_id").agg(
      least(min(col("p1")),
        min(when(col("event_type") === "view", col("ts")))).as("t1"),
      least(min(col("p2")), min(col("__q2"))).as("t2"),
      least(min(col("p3")), min(col("__q3"))).as("t3"),
      least(min(col("p4")), min(col("__q4"))).as("t4"))
    // users with state but no events this batch carry forward untouched
    val carried = prior.join(
      ev.select("user_id").distinct(), Seq("user_id"), "left_anti")
    touched.unionByName(carried)
  }

  /** foreachBatch body with the exactly-once write-then-mark protocol:
    * skip committed batch ids, else fold batch `k` onto the committed
    * state of batch `k−1` and write `stateDir/batch=k`. Batches must
    * arrive in order (foreachBatch's contract). */
  def funnelSink(stateDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      if (!ExactlyOnce.isCommitted(spark, stateDir, batchId)) {
        val prior =
          if (batchId == 0L) emptyState(spark)
          else spark.read.parquet(s"$stateDir/batch=${batchId - 1}")
        advance(prior, batch)
          .write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
        ExactlyOnce.commit(spark, stateDir, batchId)
      }
    }

  /** The driver-gated replay: band the event stream into `nBatches`
    * ts-ordered micro-batches, fold each through the exactly-once sink,
    * and answer the final state as the standard 4-row funnel summary —
    * bit-identical to the batch cascade, so it rides `event_funnel`'s
    * oracle. */
  def streamingFunnelReplay(spark: SparkSession, dir: String,
                            nBatches: Int = 4): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin(StepTypes: _*))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val stateDir = ReplayScratch.dir("sfunnel_state")
    val banded = graft.operators.RankOps
      .withGlobalNtile(ev, "__b", nBatches, Seq(col("ts"), col("event_id")))
      .localCheckpoint(false) // one rank pass, reused by every micro-batch filter
    val sink = funnelSink(stateDir)
    (1 to nBatches).foreach { k =>
      sink(banded.filter(col("__b") === k).drop("__b"), (k - 1).toLong)
    }
    val finalState = spark.read.parquet(s"$stateDir/batch=${nBatches - 1}")
    graft.operators.Funnel.summarizeSteps(finalState)
  }
}
