package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution over the part catalog — the classic warehouse
  * dedupe-the-dimension operator (Hernández & Stolfo 1995's
  * sorted-neighborhood method + transitive closure): group records that
  * are exact OR fuzzy duplicates of each other and elect a canonical
  * record per entity.
  *
  * Reference anchor: the reference dedups FACTS by exact hash
  * (`src/etl/silver`); resolving a dimension against itself (same product
  * listed under near-identical names) is the standard master-data step it
  * stops short of.
  *
  * Pipeline, every stage engine-replayable:
  *  1. EXACT COLLAPSE (the dedup/Collapse lesson): identical names group
  *     to one representative (min partkey) FIRST — an m×-duplicated
  *     catalog pays 1/m of everything downstream, and identical names are
  *     distance-0 matches by definition.
  *  2. SORTED NEIGHBORHOOD over the distinct-name reps: global
  *     (name, key) rank via the distributed range-partitioned
  *     [[RankOps.withGlobalRankCounted]] (never a single-partition
  *     window), then each rep pairs with its next [[Window]] neighbors —
  *     LINEAR candidate volume (reps × w), the method's whole point vs
  *     quadratic blocking.
  *  3. VERIFY: Levenshtein distance ≤ [[Tau]] on the candidate pairs only
  *     (both engines ship the identical DP-matrix `levenshtein`).
  *  4. TRANSITIVE CLOSURE: [[GraphOps.connectedComponents]] over the
  *     match edges (converge-or-throw, lineage-cut rounds).
  *  5. FAN BACK + ELECT: members rejoin their rep's entity; the canonical
  *     record is the entity's min partkey.
  *
  * Caveat the scaladoc owes the caller: sorted neighborhood only sees
  * matches within `w` ranks after the exact collapse — names that sort
  * far apart (typo in the first character) need a second pass under a
  * rotated key, the method's standard multi-pass extension (the knob is
  * the contract here, as nProbe is for IVF). */
object EntityRes {

  /** Neighbor window (ranks ahead) and match threshold (edit distance on
    * the ~20-40 char two-word names; 4 links spelling variants without
    * chaining unrelated colors at the gate corpora — see EntityResSpec). */
  val Window = 3
  val Tau = 4

  /** One sorted-neighborhood pass over the rep frame under `key`:
    * candidate pairs within `window` ranks of the pass ordering. */
  private def passCandidates(reps: DataFrame, key: org.apache.spark.sql.Column,
                             window: Int): DataFrame = {
    val (ranked, _) = RankOps.withGlobalRankCounted(
      reps.withColumn("__k", key), "rk", Seq(col("__k"), col("rep")))
    val offs = (1 to window).map(lit(_))
    val a = ranked.select(col("rep").as("rep_a"), col("p_name").as("name_a"),
      col("rk").as("rk_a"))
    val b = ranked.select(col("rep").as("rep_b"), col("p_name").as("name_b"),
      col("rk").as("rk_b"))
    a.withColumn("__d", explode(array(offs: _*)))
      .withColumn("rk_b", col("rk_a") + col("__d"))
      .join(b, "rk_b")
  }

  private def resolveWith(spark: SparkSession, dir: String,
                          keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column],
                          window: Int, tau: Int): DataFrame = {
    val parts = graft.Tables.part(spark, dir)
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name"))
    // 1. exact collapse
    val reps = parts.groupBy("p_name").agg(min(col("p_partkey")).as("rep"))
    // 2. one sorted-neighborhood pass per key (the method's multi-pass
    //    extension: a typo early in the sort key scatters neighbors, so
    //    each pass recovers matches the others' orderings miss)
    val cand = keys.map(k => passCandidates(reps, k(col("p_name")), window))
      .reduce(_ unionByName _)
    // 3. verify on candidates only
    val edges = cand
      .filter(levenshtein(col("name_a"), col("name_b")) <= tau)
      .select(col("rep_a"), col("rep_b"))
    // 4. transitive closure over rep edges
    val comp = GraphOps.connectedComponents(edges)
    // 5. fan back: members inherit their rep's component (singleton reps
    //    keep themselves); entity sizes + canonical election
    val members = parts.join(reps, "p_name")
      .join(comp, col("rep") === col("node"), "left")
      .select(col("p_partkey"), col("p_name"),
        coalesce(col("component"), col("rep")).as("entity_id"))
    val sizes = members.groupBy("entity_id").agg(
      count(lit(1)).as("n_members"), min(col("p_partkey")).as("__canon"))
    members.join(sizes, "entity_id")
      .select(col("p_partkey"), col("p_name"), col("entity_id"),
        col("n_members"), (col("p_partkey") === col("__canon")).as("is_canonical"))
      .orderBy("p_partkey")
  }

  /** (p_partkey, p_name, entity_id, n_members, is_canonical): entity_id =
    * min partkey reachable through exact-or-fuzzy match edges. */
  def resolveParts(spark: SparkSession, dir: String,
                   window: Int = Window, tau: Int = Tau): DataFrame =
    resolveWith(spark, dir, Seq(identity[org.apache.spark.sql.Column] _),
      window, tau)

  /** The method's multi-pass form (Hernández & Stolfo run SEVERAL passes
    * under rotated keys): pass 1 sorts by the name, pass 2 by its
    * REVERSE — a typo early in the string scatters pass-1 neighbors but
    * leaves pass-2 adjacency intact. Union of candidates, one shared
    * verify + closure. Monotone vs single-pass by construction (strictly
    * more candidate edges). */
  def resolvePartsMultipass(spark: SparkSession, dir: String,
                            window: Int = Window, tau: Int = Tau): DataFrame =
    resolveWith(spark, dir,
      Seq(identity[org.apache.spark.sql.Column] _, (c: org.apache.spark.sql.Column) => reverse(c)),
      window, tau)

  /** DuckDB oracle: the same collapse, a row_number() rank, the offset
    * join, `levenshtein`, a recursive reach closure (the dedup_clusters
    * pattern), and the same fan-back/election. */
  def resolvePartsOracle(window: Int = Window, tau: Int = Tau): String =
    s"""WITH RECURSIVE reps AS (
       |  SELECT p_name, MIN(p_partkey) AS rep FROM part GROUP BY 1
       |), rk AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY p_name, rep) AS BIGINT) AS rk
       |  FROM reps
       |), cand AS (
       |  SELECT a.rep AS rep_a, a.p_name AS name_a, b.rep AS rep_b, b.p_name AS name_b
       |  FROM rk a
       |  JOIN (SELECT unnest(range(1, ${window + 1})) AS d) ds ON TRUE
       |  JOIN rk b ON b.rk = a.rk + ds.d
       |), e0 AS (
       |  SELECT rep_a, rep_b FROM cand WHERE levenshtein(name_a, name_b) <= $tau
       |), edges AS (
       |  SELECT rep_a AS s, rep_b AS d FROM e0
       |  UNION ALL SELECT rep_b, rep_a FROM e0
       |), nodes AS (SELECT DISTINCT s AS node FROM edges),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
       |), comp AS (
       |  SELECT node, MIN(r) AS component FROM reach GROUP BY 1
       |), members AS (
       |  SELECT p.p_partkey, p.p_name,
       |    COALESCE(comp.component, reps.rep) AS entity_id
       |  FROM part p
       |  JOIN reps ON reps.p_name = p.p_name
       |  LEFT JOIN comp ON comp.node = reps.rep
       |), sz AS (
       |  SELECT entity_id, COUNT(*) AS n_members, MIN(p_partkey) AS canon
       |  FROM members GROUP BY 1
       |)
       |SELECT m.p_partkey, m.p_name, m.entity_id,
       |  sz.n_members, m.p_partkey = sz.canon AS is_canonical
       |FROM members m JOIN sz USING (entity_id)
       |ORDER BY m.p_partkey""".stripMargin

  /** DuckDB oracle for the multi-pass form: a second rank chain under
    * reverse(p_name), candidate union, the same verify + closure tail. */
  def resolvePartsMultipassOracle(window: Int = Window, tau: Int = Tau): String =
    s"""WITH RECURSIVE reps AS (
       |  SELECT p_name, MIN(p_partkey) AS rep FROM part GROUP BY 1
       |), rk1 AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY p_name, rep) AS BIGINT) AS rk
       |  FROM reps
       |), rk2 AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY reverse(p_name), rep) AS BIGINT) AS rk
       |  FROM reps
       |), cand AS (
       |  SELECT a.rep AS rep_a, a.p_name AS name_a, b.rep AS rep_b, b.p_name AS name_b
       |  FROM rk1 a
       |  JOIN (SELECT unnest(range(1, ${window + 1})) AS d) ds ON TRUE
       |  JOIN rk1 b ON b.rk = a.rk + ds.d
       |  UNION ALL
       |  SELECT a.rep, a.p_name, b.rep, b.p_name
       |  FROM rk2 a
       |  JOIN (SELECT unnest(range(1, ${window + 1})) AS d) ds ON TRUE
       |  JOIN rk2 b ON b.rk = a.rk + ds.d
       |), e0 AS (
       |  SELECT rep_a, rep_b FROM cand WHERE levenshtein(name_a, name_b) <= $tau
       |), edges AS (
       |  SELECT rep_a AS s, rep_b AS d FROM e0
       |  UNION ALL SELECT rep_b, rep_a FROM e0
       |), nodes AS (SELECT DISTINCT s AS node FROM edges),
       |reach(node, r) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
       |), comp AS (
       |  SELECT node, MIN(r) AS component FROM reach GROUP BY 1
       |), members AS (
       |  SELECT p.p_partkey, p.p_name,
       |    COALESCE(comp.component, reps.rep) AS entity_id
       |  FROM part p
       |  JOIN reps ON reps.p_name = p.p_name
       |  LEFT JOIN comp ON comp.node = reps.rep
       |), sz AS (
       |  SELECT entity_id, COUNT(*) AS n_members, MIN(p_partkey) AS canon
       |  FROM members GROUP BY 1
       |)
       |SELECT m.p_partkey, m.p_name, m.entity_id,
       |  sz.n_members, m.p_partkey = sz.canon AS is_canonical
       |FROM members m JOIN sz USING (entity_id)
       |ORDER BY m.p_partkey""".stripMargin
}
