package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate clusters: connected components over the MinHash near-dup
  * pair graph via iterative min-label propagation — each doc adopts the
  * smallest doc_id reachable from it; the component minimum becomes the
  * cluster's keeper. O(graph diameter) join rounds (near-dup components are
  * tiny in practice, so 2-3 rounds); each round is one shuffle — the
  * standard distributed CC shape, no driver-side union-find.
  *
  * The iteration runs ONLY over docs that appear in some near-dup pair (the
  * active vertex set) — at web scale near-dups are a few percent of the
  * corpus, so the per-round shuffles touch |dup docs| rows, not |corpus|
  * rows; the untouched rest of the corpus joins back in once at the end as
  * singleton clusters.
  */
object DedupClusters {

  /** (doc_id, cluster_id, is_keeper, cluster_size) for every document.
    *
    * Caching contract: intermediate frames are unpersisted before return;
    * the final label frame is `localCheckpoint`ed (tiny — one row per
    * edge-touched doc), and its blocks are released by the ContextCleaner
    * once the returned frame is unreferenced (or on `clearCache`). */
  /** `ordered = false` skips the final global sort (driver-compare
    * convenience only — production callers avoid the full-output range
    * exchange).
    *
    * Convergence contract: the output carries a `converged` column (same
    * value on every row — did a propagation round observe zero label
    * changes within `maxIters`?) so a caller can gate programmatically
    * instead of parsing the stderr warning; under `strict = true` a
    * non-converged run throws instead of returning split components. */
  def clusters(spark: SparkSession, dir: String, threshold: Double = 0.8,
               maxIters: Int = 10, ordered: Boolean = true,
               strict: Boolean = false): DataFrame = {
    // Exact duplicates collapse to one keeper BEFORE the LSH stage: a corpus
    // where docs carry m identical copies otherwise inflates every LSH
    // bucket m× and the true pair count m² — measured 20× wall-clock at a
    // 10×-duplicated corpus. Identical normalized text ⇒ identical shingle
    // sets ⇒ identical near-dup behavior, so star edges (copy → keeper) plus
    // near-dup edges among keepers yield exactly the connected components of
    // the full pair graph (the dedup_clusters oracle stays hash-green).
    val docs = graft.Tables.documents(spark, dir)
    // adaptive (same decision as the pair detectors): on a low-duplication
    // corpus the direct LSH pair graph is cheaper; on a duplicated one the
    // keeper graph avoids m²-inflated buckets. Components are identical.
    val collapse =
      Collapse.duplicationFactor(docs, Collapse.normHash) >= Collapse.CollapseThreshold
    // lazy localCheckpoint: the pair list is read twice (once per direction)
    // and the edge list is read every propagation round — materialize each
    // once; blocks are GC-freed when the frames fall out of scope
    val pairs = (if (!collapse) {
      MinHashLsh.candidatePairs(docs)
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"))
    } else {
      val (members, keeperDocs) = Collapse.byNormalizedText(docs)
      // star edges only for shingle-eligible (≥3 token) keeper groups: short
      // docs never enter any pair on the direct path, so their exact copies
      // must stay singleton clusters (mirrors nearDupPairsOf's `eligible`)
      val eligible = MinHashLsh.shingleDocs(keeperDocs).select(col("doc_id").as("keeper"))
      val starEdges = members.join(eligible, "keeper")
        .filter(col("doc_id") =!= col("keeper"))
        .select(col("keeper").as("doc_a"), col("doc_id").as("doc_b"))
      MinHashLsh.candidatePairs(keeperDocs)
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"))
        .unionByName(starEdges)
    }).localCheckpoint(false)
    // undirected: propagate labels both ways
    val edges = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .withColumnRenamed("doc_a", "src").withColumnRenamed("doc_b", "dst")
      .localCheckpoint(false)

    // active vertices = docs touched by at least one near-dup edge.
    // Per-round lineage cut, not persist: persist caches EXECUTION but
    // the logical plan still grows a join+union+agg layer per round, and
    // Catalyst re-analyzes the whole tree on every round's count — the
    // semdedup loop measured 6.4 s for round 7 alone (vs 0.4 s flat with
    // truncated lineage). Label frames are tiny (edge-touched docs), so
    // the checkpoint blocks are trivial and the ContextCleaner releases
    // them as rounds fall out of scope. The cut trades lineage recovery
    // for flat rounds — localCheckpoint blocks are non-replicated, so on a
    // real cluster an executor loss mid-loop fails the job instead of
    // recomputing; Checkpoints.cut therefore upgrades to a RELIABLE
    // checkpoint whenever the session has a checkpoint dir configured
    // (advice-r14; see graft.tools.Checkpoints).
    var labels = graft.tools.Checkpoints.cut(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // the doc's previous label rides through the aggregate (each doc has
      // exactly one labels row, so max(old) recovers it; message rows carry
      // null) — the changed-count then scans the aggregated frame alone:
      // one action and ZERO extra joins per round
      val msgs = edges.join(labels, edges("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("cluster_id"),
          lit(null).cast(labels.schema("cluster_id").dataType).as("old"))
      val next = graft.tools.Checkpoints.cut(
        labels.select(col("doc_id"), col("cluster_id"), col("cluster_id").as("old"))
          .unionByName(msgs)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"), max("old").as("old")))
      val changed = next.filter(col("cluster_id") =!= col("old")).count()
      labels = next.select("doc_id", "cluster_id")
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      val msg = s"label propagation hit maxIters=$maxIters before converging — " +
        "components wider than the iteration budget are split; raise maxIters"
      if (strict) {
        throw new IllegalStateException(s"[dedup_clusters] $msg")
      }
      System.err.println(s"[dedup_clusters] WARNING: $msg")
    }

    // component sizes from the (tiny) label frame, then cut lineage so the
    // iterative checkpoint chain can be released
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("__sz"))
    val dupLabels = labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("__sz"))
      .localCheckpoint(true)

    // everyone else is a singleton cluster of itself
    val out = Tables.documents(spark, dir).select(col("doc_id"))
      .join(dupLabels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
      .withColumn("cluster_size", coalesce(col("__sz"), lit(1L)).cast("long"))
      .withColumn("converged", lit(converged))
      .drop("__sz")
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Quality-aware keeper election: the curation step after clustering —
    * within each near-dup cluster the member with the HIGHEST quality score
    * survives (ties break to the lowest doc_id, which exact twins always
    * hit since identical text scores identically), not the arbitrary
    * min-id. Emits every document with its cluster, the elected keeper,
    * and the keep decision.
    *
    * Scale shape: the label frame is tiny (one row per doc), the quality
    * score is a row-local projection, and the election is ONE cluster-keyed
    * window over clusters whose size is bounded by near-dup component size
    * (single digits in practice) — no join beyond the label attach, no
    * global sort on the production path (`ordered = false`). */
  def clusterKeepers(spark: SparkSession, dir: String, threshold: Double = 0.8,
                     ordered: Boolean = true): DataFrame = {
    val labels = clusters(spark, dir, threshold, ordered = false)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val q = graft.text.TextOps.textStats(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality_score").desc_nulls_last, col("doc_id"))
    val out = labels.join(q, "doc_id")
      .withColumn("keeper_id", first(col("doc_id")).over(w))
      .withColumn("is_kept", col("doc_id") === col("keeper_id"))
      .select("doc_id", "cluster_id", "cluster_size", "quality_score",
        "keeper_id", "is_kept")
    if (ordered) out.orderBy("doc_id") else out
  }
}
