package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (brief requirement).
  *
  * Pipeline: word 3-gram shingles → `numHashes` MinHash signatures
  * (xxhash64 with per-hash salts) → `bands` banded bucket keys → self-join on
  * (band, bucket) for candidates only → exact shingle-set Jaccard on the
  * candidates → threshold.
  *
  * Never all-pairs: the only join is on band buckets, so candidate volume is
  * sub-quadratic (banding theory: P[collide] = 1-(1-j^r)^b for Jaccard j,
  * r = numHashes/bands rows per band). At 100 TB the bucket join shuffles on
  * hash-distributed keys; a pathological bucket (boilerplate shingle sets)
  * is bounded by exploding only distinct (band, bucket) pairs per doc.
  */
object MinHashLsh {

  /** doc_id + distinct word-3-gram shingle array. */
  def shingleDocs(docs: DataFrame): DataFrame = {
    graft.functions.TextKernels.register(docs.sparkSession)
    docs
      .withColumn("__tokens", expr("""split(lower(trim(text)), '\\s+')"""))
      .filter(size(col("__tokens")) >= 3)
      .withColumn("shingles", expr("array_distinct(word_ngrams(__tokens, 3))"))
      .select("doc_id", "shingles")
  }

  /** Adds `sig` = array of `numHashes` MinHash values — one fused pass via
    * the codegen'd graft.functions.MinHashSig expression (the k-separate
    * array_min(transform(…)) form walks the shingles k times and its Janino
    * compile time dominated cold runs). */
  def withSignatures(shingled: DataFrame, numHashes: Int): DataFrame = {
    val fn = graft.functions.MinHashSig.register(shingled.sparkSession, numHashes)
    shingled.withColumn("sig", expr(s"$fn(shingles)"))
  }

  /** Candidate pairs from banded buckets, with exact Jaccard attached.
    *
    * The shingled+signed frame is consumed three times (bucket explode and
    * one shingle re-attach per pair side); a lazy `localCheckpoint`
    * materializes it once instead of recomputing the shingle transform per
    * consumer — blocks are freed by the ContextCleaner when the plan is
    * unreferenced, so no session-lifetime cache is leaked. At 100 TB this is
    * the deliberate materialization point of the dedup pipeline (cheaper
    * than 3x reshingling the corpus). */
  def candidatePairs(docs: DataFrame, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val signed = withSignatures(shingleDocs(docs), numHashes).localCheckpoint(false)
    val bandStructs = (0 until bands).map { b =>
      val slice = (0 until r).map(i => col("sig").getItem(b * r + i))
      struct(lit(b).as("band"), xxhash64(concat_ws("|", slice: _*)).as("bucket"))
    }
    // ids only through the banded self-join (shingle arrays would be
    // replicated bands× into the shuffle); re-attach shingles once per side
    // after the pair dedup — same shape as Ann's LSH candidates
    val buckets = signed
      .withColumn("__band", explode(array(bandStructs: _*)))
      .select(col("doc_id"), col("__band.band").as("band"), col("__band.bucket").as("bucket"))
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val shA = signed.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = signed.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-dup pairs above `threshold`. Exact duplicates collapse to one
    * keeper before the LSH stage (identical normalized text ⇒ identical
    * shingles), then keeper-level pairs expand back to ALL copy-level pairs:
    * cross-group pairs inherit the keeper pair's jaccard, within-group pairs
    * are jaccard 1.0 by construction. Output is identical to running LSH on
    * the full corpus (the exact all-pairs oracle stays hash-green), but a
    * corpus with m copies per doc pays LSH cost once per distinct doc plus
    * work proportional to the emitted pairs — not m²-inflated buckets. */
  def nearDupPairsOf(docs: DataFrame, threshold: Double = 0.8,
                     numHashes: Int = 16, bands: Int = 4): DataFrame = {
    // adaptive: the collapse+expand detour only pays on duplicated corpora;
    // both paths emit identical pairs (verified bit-for-bit), so this is a
    // pure performance decision
    if (Collapse.duplicationFactor(docs, Collapse.normHash) < Collapse.CollapseThreshold)
      return candidatePairs(docs, numHashes, bands).filter(col("jaccard") >= threshold)
    val (members, keeperDocs) = Collapse.byNormalizedText(docs)
    // only shingle-eligible groups (≥3 tokens) emit within pairs — mirrors
    // the oracle's shingling filter; copies share their keeper's eligibility
    val eligible = shingleDocs(keeperDocs).select(col("doc_id").as("keeper"))
    val kPairs = candidatePairs(keeperDocs, numHashes, bands)
      .filter(col("jaccard") >= threshold)
    Collapse.expandPairs(members, kPairs, eligible, Seq(lit(1.0).as("jaccard")))
  }

  /** Near-dup pairs above `threshold` over the documents table. `ordered =
    * false` skips the output sort (driver-compare convenience only). */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.8,
                   numHashes: Int = 16, bands: Int = 4,
                   ordered: Boolean = true): DataFrame = {
    val pairs = nearDupPairsOf(Tables.documents(spark, dir), threshold, numHashes, bands)
    if (ordered) pairs.orderBy(col("doc_a"), col("doc_b")) else pairs
  }

  /** LSH recall AUDIT (r17, from the perturbed-10x gate finding): banded
    * MinHash is an approximate CANDIDATE generator — precision is 1.0 by
    * the exact-Jaccard verify, but pair recall is the banding S-curve, and
    * on a corpus saturated with genuine near-dups it is measurably < 1.
    * This surface makes that contract first-class and VALUE-VERIFIED:
    * exact pairs (shared-shingle inverted-index join — the subquadratic
    * all-true-pairs form the dedup_minhash oracle uses) LEFT JOIN the
    * banded candidate set, bucketed by jaccard bin.
    *
    * Both legs are oracle-replayable: signatures here are PORTABLE
    * hex-MD5 minhashes (sig_j = min over shingles of md5(j || '|' ||
    * shingle); string min over lowercase hex = numeric min of the 128-bit
    * value on both engines), same (numHashes, bands) geometry as the
    * shipped xxhash64 detector — statistically identical banding (both
    * uniform hashes over the same shingle sets), so the measured recall
    * audits the production geometry itself.
    *
    * 100 TB story: the exact leg is the expensive one (pair volume grows
    * with duplication²) — this is an AUDIT surface; run it on a stratified
    * sample of the corpus, not the whole thing, and let the production
    * detector stay banded. Output: (jaccard_bin, exact_pairs,
    * found_pairs, missed_pairs). */
  def minhashRecallAudit(spark: SparkSession, dir: String,
                         threshold: Double = 0.8, numHashes: Int = 16,
                         bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val docs = graft.Tables.documents(spark, dir)
    val sh = shingleDocs(docs).localCheckpoint(false)
    val exploded = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    // exact leg: inverted-index join on shared shingles
    val cnt = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val inter = exploded.alias("a").join(exploded.alias("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("isect"))
    val exact = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard", col("isect").cast("double") /
        (col("na") + col("nb") - col("isect")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    // portable hex-MD5 signatures (see doc) — one explode, k min-aggs
    val sigs = exploded.groupBy("doc_id")
      .agg((0 until numHashes).map(j =>
          min(md5(concat(lit(j.toString), lit("|"), col("sh")))).as(s"h$j")).head,
        (1 until numHashes).map(j =>
          min(md5(concat(lit(j.toString), lit("|"), col("sh")))).as(s"h$j")): _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until r).map(i => col(s"h${b * r + i}")): _*).as("bucket"))
    }
    val buckets = sigs.withColumn("__band", explode(array(bandStructs: _*)))
      .select(col("doc_id"), col("__band.band").as("band"),
        col("__band.bucket").as("bucket"))
    val ca = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val cb = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val found = ca.join(cb, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
      .withColumn("__found", lit(1L))
    exact.join(found, Seq("doc_a", "doc_b"), "left")
      .withColumn("jaccard_bin",
        when(col("jaccard") >= 0.95, "0.95+")
          .when(col("jaccard") >= 0.9, "0.90-0.95")
          .when(col("jaccard") >= 0.85, "0.85-0.90")
          .otherwise("0.80-0.85"))
      .groupBy("jaccard_bin")
      .agg(count(lit(1)).as("exact_pairs"),
        sum(coalesce(col("__found"), lit(0L))).as("found_pairs"))
      .withColumn("missed_pairs", col("exact_pairs") - col("found_pairs"))
      .orderBy("jaccard_bin")
  }

  /** DuckDB replay of [[minhashRecallAudit]] — both legs, same portable
    * hex-MD5 signature rule (string min over lowercase hex digests). */
  def minhashRecallAuditOracle(threshold: Double = 0.8, numHashes: Int = 16,
                               bands: Int = 4): String = {
    val r = numHashes / bands
    val sigCols = (0 until numHashes).map(j =>
      s"min(md5('$j' || '|' || sh)) AS h$j").mkString(",\n    ")
    val bandArms = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"h${b * r + i}").mkString(" || '|' || ")
      s"  SELECT doc_id, $b AS band, $key AS bucket FROM sg"
    }.mkString("\n  UNION ALL\n")
    s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
       |e AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 3),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1),
       |         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh FROM e),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pairs AS (SELECT doc_a, doc_b, CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) AS jaccard
       |          FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |          WHERE CAST(isect AS DOUBLE) / (ca.n + cb.n - isect) >= $threshold),
       |sg AS MATERIALIZED (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM sh GROUP BY doc_id),
       |bk AS MATERIALIZED (
       |$bandArms
       |),
       |fnd AS (SELECT DISTINCT a.doc_a, a.doc_b FROM (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.bucket = y.bucket
       |    AND x.doc_id < y.doc_id) a)
       |SELECT jaccard_bin, CAST(COUNT(*) AS BIGINT) AS exact_pairs,
       |  CAST(SUM(found) AS BIGINT) AS found_pairs,
       |  CAST(COUNT(*) - SUM(found) AS BIGINT) AS missed_pairs
       |FROM (
       |  SELECT CASE WHEN p.jaccard >= 0.95 THEN '0.95+'
       |              WHEN p.jaccard >= 0.9 THEN '0.90-0.95'
       |              WHEN p.jaccard >= 0.85 THEN '0.85-0.90'
       |              ELSE '0.80-0.85' END AS jaccard_bin,
       |    CASE WHEN fnd.doc_a IS NULL THEN 0 ELSE 1 END AS found
       |  FROM pairs p
       |  LEFT JOIN fnd ON fnd.doc_a = p.doc_a AND fnd.doc_b = p.doc_b)
       |GROUP BY jaccard_bin
       |ORDER BY jaccard_bin""".stripMargin
  }

  /** The production DEFAULT for whole-corpus near-dup dedup: the
    * doc-bounded decision frame — every document with its keep/drop
    * decision, elected keeper, and cluster size (the MinHash pair graph →
    * connected components → quality-aware keeper pipeline,
    * [[DedupClusters.clusterKeepers]] reused verbatim).
    *
    * Why this is the default and [[nearDupPairs]] the audit surface: the
    * pair list grows with the SQUARE of per-doc duplication (measured
    * 27.3M pairs / 108.9 s at the 100×-replicated corpus, where every doc
    * has 99 verbatim twins), while this frame is |docs| rows at any
    * duplication factor — the shape a curation executor actually consumes
    * (filter `keep`, or map doc → keeper). The pair form stays available
    * exactly because it is the evidence trail the decision frame compresses
    * away. */
  def nearDupKeepers(spark: SparkSession, dir: String, threshold: Double = 0.8,
                     ordered: Boolean = true): DataFrame =
    DedupClusters.clusterKeepers(spark, dir, threshold, ordered)
      .select(col("doc_id"), col("is_kept").as("keep"),
        col("keeper_id"), col("cluster_size"))
}
