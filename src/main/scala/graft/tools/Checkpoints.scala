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
  * DEPLOYMENT REQUIREMENT (advice-r15): Spark only garbage-collects
  * reliable checkpoint files when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  * FALSE) is set at SparkContext creation. The converge-until-done loops
  * ([[graft.dedup.SemDeDup]], [[graft.operators.GraphOps]],
  * [[graft.dedup.DedupClusters]]) create one checkpoint per round up to
  * maxIters=1000 — without the cleaner flag that is unbounded
  * checkpoint-dir growth on exactly the cluster deployments the reliable
  * branch exists for. Set the flag on any session that configures a
  * checkpoint dir; [[cut]] warns once per JVM if it is missing. (Files
  * are also bounded by the checkpoint dir's storage lifecycle policy —
  * most object stores can expire the prefix — but the cleaner flag is
  * the in-band fix.)
  *
  * Both flavours are requested lazily (`eager = false`): the frames in
  * these loops are materialized by the round's own `count()` action, so an
  * eager extra job per round would be pure overhead.
  */
object Checkpoints {

  @volatile private var warnedLeak = false

  /** Truncate `df`'s lineage: reliable `checkpoint` when a checkpoint dir
    * is configured on the session (cluster deployments), lazy
    * `localCheckpoint` otherwise (single-node / test harness). */
  def cut(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) {
      if (!warnedLeak &&
          !sc.getConf.getBoolean(
            "spark.cleaner.referenceTracking.cleanCheckpoints", false)) {
        warnedLeak = true
        Console.err.println(
          "[graft.tools.Checkpoints] WARNING: reliable checkpointing is " +
            "active but spark.cleaner.referenceTracking.cleanCheckpoints " +
            "is false — per-round checkpoint files under " +
            s"${sc.getCheckpointDir.get} will accumulate unboundedly in " +
            "converge-until-done loops. Set the flag at context creation.")
      }
      df.checkpoint(eager = false)
    } else df.localCheckpoint(eager = false)
  }
}
