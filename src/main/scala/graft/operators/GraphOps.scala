package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the sales graph — PageRank (Page,
  * Brin, Motwani, Winograd 1999) on the customer–product bipartite graph
  * induced by orders×lineitem. The dedup components loop proved the
  * iterative-join shape; this operator adds the canonical weighted
  * propagation variant (rank mass, damping, teleport) the reference's
  * analytics layer has no equivalent for.
  *
  * Exact-integer arithmetic end to end (the zorder/retrieval_metrics
  * recipe): rank is BIGINT mass out of a 10^12 base, every division is
  * floor division, and the damping multiply precedes the floor divide in
  * a pinned order — so ten iterations produce bit-identical BIGINTs on
  * both engines and the query is hash-gated, not rows-only. Floor-division
  * mass leakage is deliberate, defined behavior (both engines leak the
  * SAME remainders; ranking is unaffected).
  *
  * Spark-first scale shape:
  *  - the edge list (with out-degrees pre-joined) is built ONCE and
  *    lineage-cut; each iteration is one edges⋈ranks shuffle join + one
  *    dst-keyed aggregation — the Pregel-on-DataFrames shape, linear in
  *    |E| per round with no driver-side data movement;
  *  - per-round [[graft.tools.Checkpoints.cut]] keeps the logical plan
  *    flat (the measured semdedup lesson: persist alone re-analyzes a
  *    growing tree every round) and upgrades to reliable checkpoints on
  *    clusters with a checkpoint dir;
  *  - the bipartite doubling means no dangling nodes (every node has an
  *    out-edge), so no dangling-mass redistribution pass is needed;
  *  - iteration count is FIXED (10) — convergence-blind but replayable.
  *    The bipartite graph oscillates with period 2 (every edge crosses
  *    sides), damped at 0.85/round — ten rounds leave a ~0.85^10 ≈ 20%
  *    residual oscillation in MASS while rank ORDER stabilizes much
  *    earlier (GraphOpsSpec pins the geometric decay); `iters` is the
  *    accuracy knob when absolute mass matters. */
object GraphOps {

  /** Total rank mass (10^12): large enough that floor-division noise sits
    * ~6 decimal orders below the per-node rank at any realistic node
    * count, small enough that 85·Σrank stays far inside BIGINT. */
  val RankBase = 1000000000000L
  val Damping = 85 // percent
  val Iters = 10

  /** (node_type, node_key, out_degree, rank) for every node of the
    * customer–part graph: rank = integer PageRank mass after [[Iters]]
    * damped iterations. Node encoding: customers ↦ 2·custkey,
    * parts ↦ 2·partkey+1 (disjoint key spaces in one BIGINT column). */
  def pageRank(spark: SparkSession, dir: String,
               iters: Int = Iters, ordered: Boolean = true): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    // distinct bipartite edges, built and MATERIALIZED once (optimization
    // r17, guide §2.4: the uncut frame was recomputed by outdeg, by the
    // rank init, and by the final join — four orders⋈lineitem passes for
    // one logical edge list); doubled for the undirected random walk
    val e0 = graft.tools.Checkpoints.cut(
      orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
        .distinct())
    val edges = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val outdeg = graft.tools.Checkpoints.cut(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // outdeg already has exactly one row per node (it groups the doubled
    // edge list by src) — counting it avoids a second distinct over 2|E|
    val n = outdeg.count()
    require(n > 0, "pageRank on an empty graph")
    // out-degree rides the edge list so iterations touch ONE prebuilt
    // frame. Measured r17 NON-change: pre-partitioning+sorting edgesD on
    // src (hoping the per-round join would skip its edge-side exchange,
    // guide §2.4) does NOT pay — a lazy localCheckpoint under AQE captures
    // UnknownPartitioning, so every round re-exchanges regardless and the
    // build-time repartition+sort was pure extra cost (7.3 s vs 5.6 s at
    // sf0.1). The winning shape is just: materialize once, iterate.
    // outdeg (one row per node) is broadcast into the 2|E|-row edge build
    // and the final join under the same size gate as the per-round rank
    // frame — the |V|-sized sides never force an edge-side exchange.
    val edgesD = graft.tools.Checkpoints.cut(
      edges.join(bcastIf(n <= BroadcastRanksMaxNodes, outdeg), "src"))
    val init = RankBase / n
    val teleport = (RankBase * 15L) / (100L * n)

    // share = r // deg per out-edge; damp AFTER the sum (one floor, not
    // |E|) — the shared [[iterate]] core. Rank init reads the (cut,
    // one-row-per-node) outdeg frame instead of re-distinct-ing 2|E| rows.
    val ranks = iterate(edgesD,
      outdeg.select(col("src").as("node")).withColumn("r", lit(init)),
      teleport, iters, n)
    val out = ranks
      .join(bcastIf(n <= BroadcastRanksMaxNodes, outdeg),
        ranks("node") === outdeg("src"))
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("part"))
          .as("node_type"),
        expr("node div 2").as("node_key"),
        col("deg").as("out_degree"),
        col("r").as("rank"))
    if (ordered) out.orderBy("node_type", "node_key") else out
  }

  /** Node count at or below which [[iterate]] broadcast-hints the rank
    * frame into each round's join. A rank row is (node, r) = 16 payload
    * bytes, so the cap bounds the broadcast relation at tens of MB — far
    * under the 8 GB broadcast ceiling, far above any gate corpus. Why the
    * hint exists (optimization r18, guide §3.1): the per-round frames are
    * checkpointed RDDs, and a localCheckpoint reports UnknownPartitioning
    * AND default stats in the STATIC plan (measured on this Spark — eager
    * or lazy), so every round statically plans a SortMergeJoin (exchange +
    * sort on the 2|E| edge side) that AQE then re-plans to a broadcast at
    * runtime, paying a ranks-side exchange stage + replan latency per
    * round. The explicit hint makes the broadcast the static plan: zero
    * per-round edge-side Exchange/Sort, one fewer AQE stage per round.
    * Above the cap the plain shuffle join formulation stays — at that
    * scale the per-round rank-share shuffle is the algorithm's floor. */
  val BroadcastRanksMaxNodes = 1000000L

  /** `broadcast(df)` under the [[BroadcastRanksMaxNodes]]-style size gate —
    * shared by every |V|-row join side in this file (rank frames, degree
    * frames, component labels). Join strategy only; results identical. */
  private def bcastIf(hint: Boolean, df: DataFrame): DataFrame =
    if (hint) broadcast(df) else df

  /** The damped integer power-iteration core shared by the cold and
    * warm-start paths: `edgesD` must carry (src, dst, deg); `ranks0`
    * (node, r) seeds the iteration; `nNodes` (the exact rank-frame row
    * count, one row per node every round) gates the broadcast hint. */
  private def iterate(edgesD: DataFrame, ranks0: DataFrame,
                      teleport: Long, iters: Int, nNodes: Long): DataFrame = {
    val hint = nNodes <= BroadcastRanksMaxNodes
    var ranks = ranks0
    var i = 0
    while (i < iters) {
      val r = if (hint) broadcast(ranks) else ranks
      ranks = graft.tools.Checkpoints.cut(
        edgesD.join(r, edgesD("src") === r("node"))
          .select(col("dst"), expr("r div deg").as("share"))
          .groupBy("dst")
          .agg(sum(col("share")).as("s"))
          .select(col("dst").as("node"),
            (lit(teleport) + expr(s"($Damping * s) div 100")).as("r")))
      i += 1
    }
    ranks
  }

  /** Incremental PageRank — warm-start maintenance over a GROWING graph
    * (the streaming-analytics form of [[pageRank]]): the settled graph
    * (orders before `cutoff`) converges once; when the delta arrives, the
    * union graph re-iterates only [[DeltaIters]] rounds FROM THE SETTLED
    * RANKS instead of [[Iters]] from uniform — the standard warm-start
    * power-iteration argument (the residual starts at the perturbation
    * magnitude, not at 1). New nodes seed at the union-uniform mass; all
    * arithmetic stays the exact-integer recipe, so the query is
    * hash-gated. Spec pins the claim that matters: warm-start after
    * [[DeltaIters]] rounds lands closer to the union fixpoint than a cold
    * start after the same rounds.
    *
    * Scale shape: the settled ranks are the persisted artifact (in
    * production, last night's output); the incremental cost is
    * DeltaIters/Iters of a full recompute over the union edge list — the
    * same Pregel rounds, just fewer of them. */
  def pageRankIncremental(spark: SparkSession, dir: String,
                          settledIters: Int = Iters, deltaIters: Int = DeltaIters,
                          ordered: Boolean = true): DataFrame = {
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    // ONE orders⋈lineitem pass derives BOTH edge sets (optimization r17,
    // guide §2.3/§2.4: the settled and union graphs used to be two
    // independent join+distinct passes over the fact tables; a pair is a
    // settled edge iff SOME pre-cutoff order links it, so one grouped
    // pass with a has_pre flag is value-identical). Materialized once.
    val pairs = graft.tools.Checkpoints.cut(
      orders.join(li, orders("o_orderkey") === li("l_orderkey"))
        .groupBy((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
        .agg(max(when(col("o_orderdate") < lit(Cutoff), 1).otherwise(0)).as("__pre")))
    def doubled(e0: DataFrame): DataFrame =
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val settled = doubled(pairs.filter(col("__pre") === 1).select("src", "dst"))
    val union = doubled(pairs.select("src", "dst"))

    // phase 1: the settled fixpoint (in production: loaded, not computed).
    // Degree frames are cut (one row per node, reused 3×); edge frames are
    // materialized once — see pageRank's rationale (and its measured
    // repartition+sort non-change).
    val sDeg = graft.tools.Checkpoints.cut(
      settled.groupBy("src").agg(count(lit(1)).as("deg")))
    val nS = sDeg.count()
    require(nS > 0, "pageRankIncremental: empty settled graph")
    val sEdges = graft.tools.Checkpoints.cut(
      settled.join(bcastIf(nS <= BroadcastRanksMaxNodes, sDeg), "src"))
    val sRanks = iterate(sEdges,
      sDeg.select(col("src").as("node")).withColumn("r", lit(RankBase / nS)),
      (RankBase * 15L) / (100L * nS), settledIters, nS)

    // phase 2: warm-start on the union graph
    val uDeg = graft.tools.Checkpoints.cut(
      union.groupBy("src").agg(count(lit(1)).as("deg")))
    val nU = uDeg.count()
    val uEdges = graft.tools.Checkpoints.cut(
      union.join(bcastIf(nU <= BroadcastRanksMaxNodes, uDeg), "src"))
    val warm0 = graft.tools.Checkpoints.cut(
      uDeg.select(col("src").as("node"))
        .join(bcastIf(nS <= BroadcastRanksMaxNodes,
          sRanks.withColumnRenamed("r", "rs")), Seq("node"), "left")
        .select(col("node"), coalesce(col("rs"), lit(RankBase / nU)).as("r")))
    val warm = iterate(uEdges, warm0, (RankBase * 15L) / (100L * nU), deltaIters, nU)

    val out = warm.join(bcastIf(nU <= BroadcastRanksMaxNodes, uDeg),
      warm("node") === uDeg("src"))
      .select(
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("part"))
          .as("node_type"),
        expr("node div 2").as("node_key"),
        col("deg").as("out_degree"),
        col("r").as("rank"))
    if (ordered) out.orderBy("node_type", "node_key") else out
  }

  /** The settled/delta boundary (the drift_check date split) and the
    * warm-start round budget. */
  val Cutoff = "1998-01-01"
  val DeltaIters = 5

  /** DuckDB oracle for [[pageRankIncremental]]: the settled rounds
    * unrolled over the pre-cutoff edge set, the COALESCE warm seed, then
    * the delta rounds over the union edge set. */
  def pageRankIncrementalOracle(settledIters: Int = Iters,
                                deltaIters: Int = DeltaIters): String = {
    def rounds(prefix: String, edges: String, deg: String, pTbl: String,
               from: String, n: Int) =
      (1 to n).map { t =>
        val prev = if (t == 1) from else s"$prefix${t - 1}"
        s"""$prefix$t AS MATERIALIZED (
           |  SELECT e.dst AS node,
           |    CAST((SELECT tp FROM $pTbl) + ($Damping * SUM(r // deg)) // 100 AS BIGINT) AS r
           |  FROM $edges e JOIN $prev ON e.src = $prev.node
           |  JOIN $deg ON $deg.src = e.src
           |  GROUP BY e.dst)""".stripMargin
      }.mkString(",\n")
    s"""WITH se0 AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_partkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |  WHERE o.o_orderdate < TIMESTAMP '$Cutoff'
       |), se AS MATERIALIZED (
       |  SELECT src, dst FROM se0 UNION ALL SELECT dst, src FROM se0
       |), sod AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM se GROUP BY 1),
       |sp AS (SELECT COUNT(*) AS nn, CAST($RankBase AS BIGINT) // COUNT(*) AS init,
       |       (CAST($RankBase AS BIGINT) * 15) // (100 * COUNT(*)) AS tp FROM sod),
       |sr0 AS MATERIALIZED (
       |  SELECT src AS node, CAST((SELECT init FROM sp) AS BIGINT) AS r FROM sod
       |),
       |${rounds("sr", "se", "sod", "sp", "sr0", settledIters)},
       |ue0 AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_partkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |), ue AS MATERIALIZED (
       |  SELECT src, dst FROM ue0 UNION ALL SELECT dst, src FROM ue0
       |), uod AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM ue GROUP BY 1),
       |up AS (SELECT COUNT(*) AS nn, CAST($RankBase AS BIGINT) // COUNT(*) AS init,
       |       (CAST($RankBase AS BIGINT) * 15) // (100 * COUNT(*)) AS tp FROM uod),
       |ur0 AS MATERIALIZED (
       |  SELECT uod.src AS node,
       |    CAST(COALESCE(sr$settledIters.r, (SELECT init FROM up)) AS BIGINT) AS r
       |  FROM uod LEFT JOIN sr$settledIters ON sr$settledIters.node = uod.src
       |),
       |${rounds("ur", "ue", "uod", "up", "ur0", deltaIters)}
       |SELECT
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
       |  node // 2 AS node_key,
       |  uod.deg AS out_degree,
       |  r AS "rank"
       |FROM ur$deltaIters JOIN uod ON uod.src = ur$deltaIters.node
       |ORDER BY node_type, node_key""".stripMargin
  }

  /** Generic connected components over an undirected pair list — the
    * min-label propagation loop (the dedup_clusters shape) exposed as a
    * public graph API: returns (node, component) for every edge-touched
    * node, component = min reachable node id. Runs UNTIL CONVERGED (the
    * SemDeDup strict contract: silent under-merge vs an oracle's fully
    * converging recursive CTE is undiagnosable), throwing on the
    * `maxIters` safety rail; per-round [[graft.tools.Checkpoints.cut]]
    * keeps rounds flat and clusters executor-loss-safe. `pairs` must
    * carry two BIGINT columns (either direction; doubling happens here). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 1000): DataFrame = {
    val cols = pairs.columns
    require(cols.length == 2, s"connectedComponents wants (src, dst), got ${cols.toSeq}")
    val p = pairs.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val edges = graft.tools.Checkpoints.cut(
      p.unionByName(p.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = graft.tools.Checkpoints.cut(
      edges.select(col("src").as("node")).distinct()
        .withColumn("component", col("node")))
    // one count over the already-materialized checkpoint gates the same
    // size-gated broadcast the PageRank loop uses: labels is one 16-byte
    // row per edge-touched node every round, and without the hint each
    // round statically plans a SortMergeJoin against the checkpointed
    // edge RDD (UnknownPartitioning + default stats)
    val hintLabels = labels.count() <= BroadcastRanksMaxNodes
    var converged = false
    var i = 0
    while (!converged) {
      val msgs = edges.join(bcastIf(hintLabels, labels),
          edges("src") === labels("node"))
        .select(col("dst").as("node"), col("component"),
          lit(null).cast("long").as("old"))
      val next = graft.tools.Checkpoints.cut(labels
        .select(col("node"), col("component"), col("component").as("old"))
        .unionByName(msgs)
        .groupBy("node")
        .agg(min("component").as("component"), max("old").as("old")))
      val changed = next.filter(col("component") =!= col("old")).count()
      labels = next.select("node", "component")
      converged = changed == 0
      i += 1
      if (!converged && i >= maxIters)
        throw new IllegalStateException(s"[connectedComponents] hit the " +
          s"maxIters=$maxIters safety rail — propagation converges within " +
          "the widest component's diameter; raise maxIters only if such a " +
          "component is genuinely expected")
    }
    labels
  }

  /** DuckDB oracle: the same ten unrolled integer iterations (HUGEINT
    * intermediates collapse back to the identical BIGINTs — magnitudes
    * stay far inside 2^63 by construction). */
  def pageRankOracle(iters: Int = Iters): String = {
    val rounds = (1 to iters).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST((SELECT tp FROM p) + ($Damping * SUM(r // deg)) // 100 AS BIGINT) AS r
         |  FROM e JOIN r${t - 1} ON e.src = r${t - 1}.node
         |  JOIN od ON od.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_partkey * 2 + 1 AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       |), e AS MATERIALIZED (
       |  SELECT src, dst FROM e0
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM e0
       |), od AS MATERIALIZED (
       |  SELECT src, COUNT(*) AS deg FROM e GROUP BY 1
       |), p AS (
       |  SELECT COUNT(*) AS nn,
       |    CAST($RankBase AS BIGINT) // COUNT(*) AS init,
       |    (CAST($RankBase AS BIGINT) * 15) // (100 * COUNT(*)) AS tp
       |  FROM od
       |), r0 AS MATERIALIZED (
       |  SELECT src AS node, CAST((SELECT init FROM p) AS BIGINT) AS r FROM od
       |),
       |$rounds
       |SELECT
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS node_type,
       |  node // 2 AS node_key,
       |  od.deg AS out_degree,
       |  r AS "rank"
       |FROM r$iters JOIN od ON od.src = r$iters.node
       |ORDER BY node_type, node_key""".stripMargin
  }
}
