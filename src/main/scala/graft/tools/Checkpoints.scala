package graft.tools

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative loops.
  *
  * Per-round `persist` caches EXECUTION but the logical plan still grows a
  * join+union+agg layer per round and Catalyst re-analyzes the whole tree
  * on every round's action — measured 6.4 s for round 7 alone (vs 0.4 s
  * flat with truncated lineage) on a 344-edge graph (see
  * `dedup/SemDeDup.scala`). So iterative label frames are checkpointed.
  *
  * The trade-off between the two checkpoint flavours (advice-r14):
  * `localCheckpoint` stores NON-REPLICATED blocks on the executors that
  * computed them — with lineage truncated, losing an executor mid-loop
  * FAILS the job instead of recomputing (plain `persist` would have
  * recovered via lineage). Fine on the single-JVM gate harness; wrong
  * default for a 1000-executor cluster. [[cut]] therefore prefers a
  * RELIABLE checkpoint (HDFS/object-store blocks, executor-loss safe)
  * whenever the session has `sparkContext.setCheckpointDir` configured,
  * and falls back to `localCheckpoint` only when it doesn't.
  *
  * Both flavours are requested lazily (`eager = false`): the frames in
  * these loops are materialized by the round's own `count()` action, so an
  * eager extra job per round would be pure overhead.
  */
object Checkpoints {

  /** Truncate `df`'s lineage: reliable `checkpoint` when a checkpoint dir
    * is configured on the session (cluster deployments), lazy
    * `localCheckpoint` otherwise (single-node / test harness). */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)
}
