package graft.dedup

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication — the "dedup the repeated passage,
  * not the whole document" operator (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better"), re-expressed for Spark as
  * duplicated word-n-gram islands instead of a suffix array: a token span
  * is duplicated when the n-gram starting there occurs at least twice in
  * the whole corpus (across or within documents); overlapping and adjacent
  * duplicated spans merge into maximal islands, and each document reports
  * its duplicated-token mass. Reference analog: none (its dedup stops at
  * whole-document hashes); beyond-reference LLM-pipeline surface.
  *
  * Scale shape (100 TB): gram extraction is a row-local projection (factor-n
  * byte inflation is the price of exactness — a production corpus would
  * substitute a 64-bit rolling hash for the gram text without changing the
  * plan); the duplicate-gram set is ONE gram-keyed aggregate with map-side
  * partial counts; membership is a gram-keyed semi-join (shuffle both
  * sides, never broadcast — the dup-gram set grows with the corpus); island
  * merge is a doc-keyed window (each document's spans sort within its own
  * partition — no global order, no single-partition window). Nothing is
  * quadratic: a pathological 1000×-duplicated passage costs 1000 gram rows,
  * not 1000² pairs — and when exact whole-document duplication is plural
  * (factor ≥ [[Collapse.CollapseThreshold]]) the adaptive collapse runs the
  * gram pipeline on distinct texts only, weighting the duplicate-gram sum
  * by copy count, so an m×-duplicated corpus pays ~1/m of the gram work.
  */
object DupSpans {

  /** Gram width in words. 8 keeps chance collisions negligible even on a
    * small vocabulary while catching real copied passages. */
  val N = 8

  /** Duplicated-token budget: a document survives while duplicated tokens
    * stay under half its length (span REMOVAL, the Lee-et-al. action, is
    * `islands` below — the keep flag is the report-level summary). */
  val KeepFrac = 0.5

  private def withWords(df: DataFrame): DataFrame =
    df.withColumn("__w", expr("""split(lower(trim(text)), '\\s+')"""))

  /** Island pipeline over a prepared frame (doc_id, __w, __n, __m): grams,
    * the multiplicity-weighted duplicate-gram set (a gram is duplicated
    * when Σ copies ≥ 2 — each occurrence row carries its document's copy
    * count, so the collapsed pipeline counts exactly what the uncollapsed
    * one would), the semi-join back, and the per-doc gaps-and-islands
    * merge. */
  private def islandsFrom(d: DataFrame): DataFrame = {
    graft.functions.TextKernels.register(d.sparkSession)
    // posexplode_outer: InferFiltersFromGenerate would otherwise duplicate
    // the gram build into a pushed-down size() filter (interpreted, 3× per
    // row — see TrainPrep.contaminationCheck); the __n >= N pre-filter
    // guarantees non-empty arrays, so outer emits exactly the same rows
    val grams = d.filter(col("__n") >= N)
      .select(col("doc_id"), col("__m"),
        posexplode_outer(expr(s"word_ngrams(__w, $N)")).as(Seq("s", "g")))
    val dupGrams = grams.groupBy("g").agg(sum(col("__m")).as("__c"))
      .filter(col("__c") >= 2).select("g")
    val spans = grams.join(dupGrams, Seq("g"), "left_semi")
      .select(col("doc_id"), col("s").cast("long").as("s"),
        (col("s") + (N - 1)).cast("long").as("e"))
    val w = Window.partitionBy("doc_id").orderBy("s")
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("__new",
        when(prevMax.isNull || col("s") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  /** (doc_id, s, e) maximal duplicated islands, token-indexed [s, e]. */
  def islands(spark: SparkSession, dir: String): DataFrame =
    islandsFrom(withWords(Tables.documents(spark, dir))
      .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("__n"),
        lit(1L).as("__m")))

  /** Per-document rollup: token count, island count, duplicated-token mass
    * and fraction, and the keep decision at [[KeepFrac]].
    *
    * The doc frame and the island frame combine as a union + ONE doc-keyed
    * aggregate rather than a left join: an aggregate's output key is
    * provably unique, so Catalyst would eliminate the join under a
    * count-only action and a `count()`-based benchmark would time a bare
    * scan instead of the dedup pipeline. The union keeps the measured plan
    * the executed plan; cost is the same one shuffle either way. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    if (Collapse.duplicationFactor(docs, Collapse.normHash) < Collapse.CollapseThreshold)
      finishRollup(perDocRollup(withWords(docs)
        .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("__n"),
          lit(1L).as("__m"))))
    else {
      // Heavy exact duplication: gram-analyze each distinct text ONCE
      // (carrying its copy count into the duplicate-gram sum), then fan the
      // keeper's island rollup back out to every copy — identical
      // normalized text ⇒ identical tokens ⇒ identical islands, so the
      // expansion reproduces exactly what the direct pipeline would emit.
      // (The MinHash/SimHash collapse recipe, Collapse.scala.)
      val (members, kd) = collapsedKeeperFrame(docs)
      val keeperRollup = perDocRollup(kd)
        .withColumnRenamed("doc_id", "keeper")
      finishRollup(members.select(col("doc_id"), col("keeper"))
        .join(keeperRollup, "keeper")
        .select(col("doc_id"), col("n_tokens"), col("n_dup_spans"), col("dup_tokens")))
    }
  }

  /** Collapse prep shared by [[dupSpans]] and [[spanRemoval]]: the
    * (copy → keeper) membership plus the tokenized keeper frame carrying
    * each keeper's copy multiplicity `__m`. */
  private def collapsedKeeperFrame(docs: DataFrame): (DataFrame, DataFrame) = {
    val (members, keeperDocs) = Collapse.byNormalizedText(docs)
    val mult = members.groupBy("keeper").agg(countAll.as("__m"))
    val kd = withWords(keeperDocs)
      .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("__n"))
      .join(mult, col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("__w"), col("__n"), col("__m"))
    (members, kd)
  }

  /** The span-REMOVAL action (Lee et al. 2021 §4): the cleaned corpus with
    * every duplicated island excised from the normalized token stream —
    * what a training pipeline actually feeds the tokenizer, not just the
    * report. Emits per doc the token count, removed-token count, and
    * `cleaned_text` (space-joined surviving tokens; "" when the whole
    * document is one duplicated island, e.g. an exact duplicate).
    *
    * Scale shape: islands per doc collect into one small array (islands
    * are maximal and disjoint, so a doc holds at most n_tokens/(N+1)+1 of
    * them — single-digit in practice), the excision is a row-local
    * indexed-filter over the token array, and the only new shuffle is the
    * doc-keyed island collect. Under heavy exact duplication the adaptive
    * collapse cleans each distinct text once and fans the result out —
    * identical normalized text ⇒ identical islands ⇒ identical cleaned
    * text. */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    if (Collapse.duplicationFactor(docs, Collapse.normHash) < Collapse.CollapseThreshold)
      cleanedFrom(withWords(docs)
        .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("__n"),
          lit(1L).as("__m")))
    else {
      val (members, kd) = collapsedKeeperFrame(docs)
      val kc = cleanedFrom(kd).withColumnRenamed("doc_id", "keeper")
      members.select(col("doc_id"), col("keeper"))
        .join(kc, "keeper")
        .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
    }
  }

  private def cleanedFrom(d: DataFrame): DataFrame = {
    val isl = islandsFrom(d)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("__isl"))
    d.join(isl, Seq("doc_id"), "left")
      .withColumn("__kept",
        // 0-based filter index against the 0-based island bounds; islands
        // are few per doc, so the exists probe is effectively O(tokens)
        expr("filter(__w, (x, i) -> __isl IS NULL OR NOT exists(__isl, r -> i >= r.s AND i <= r.e))"))
      .select(
        col("doc_id"),
        col("__n").as("n_tokens"),
        (col("__n") - size(col("__kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("__kept")).as("cleaned_text"))
  }

  /** Union + ONE doc-keyed aggregate (not a left join: an aggregate's
    * output key is provably unique, so Catalyst would eliminate the join
    * under a count-only action and a `count()`-based benchmark would time a
    * bare scan instead of the dedup pipeline — the union keeps the measured
    * plan the executed plan at the same one-shuffle cost). */
  private def perDocRollup(d: DataFrame): DataFrame = {
    val base = d.select(col("doc_id"), col("__n").as("n_tokens"),
      lit(0L).as("__spans"), lit(0L).as("__dup"))
    val isl = islandsFrom(d)
      .select(col("doc_id"), lit(0L).as("n_tokens"), lit(1L).as("__spans"),
        (col("span_end") - col("span_start") + 1).as("__dup"))
    base.unionByName(isl)
      .groupBy("doc_id")
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        sum(col("__spans")).as("n_dup_spans"),
        sum(col("__dup")).as("dup_tokens"))
  }

  private def finishRollup(rollup: DataFrame): DataFrame =
    rollup
      .withColumn("dup_frac",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("dup_tokens").cast("double") / col("n_tokens")))
      .withColumn("is_kept", col("dup_frac") <= KeepFrac)

  /** DuckDB twin: same grams, same dup set, same gaps-and-islands window. */
  def dupSpansOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS nt FROM d
       |), g AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
       |    CAST(i - 1 + ${N - 1} AS BIGINT) AS e,
       |    array_to_string(list_slice(w, i, i + ${N - 1}), ' ') AS gr
       |  FROM n, unnest(range(1, CAST(nt - $N + 2 AS BIGINT))) AS t(i)
       |  WHERE nt >= $N
       |), dup AS (
       |  SELECT gr FROM g GROUP BY gr HAVING COUNT(*) >= 2
       |), sp AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
       |      THEN 1 ELSE 0 END AS nw
       |  FROM g WHERE gr IN (SELECT gr FROM dup)
       |), isl AS (
       |  SELECT doc_id,
       |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island, s, e
       |  FROM sp
       |), agg AS (
       |  SELECT doc_id, CAST(COUNT(DISTINCT island) AS BIGINT) AS n_dup_spans,
       |    CAST(SUM(mx - mn + 1) AS BIGINT) AS dup_tokens
       |  FROM (SELECT doc_id, island, MIN(s) AS mn, MAX(e) AS mx
       |        FROM isl GROUP BY doc_id, island)
       |  GROUP BY doc_id
       |)
       |SELECT n.doc_id, nt AS n_tokens,
       |  coalesce(n_dup_spans, 0) AS n_dup_spans,
       |  coalesce(dup_tokens, 0) AS dup_tokens,
       |  CASE WHEN nt = 0 THEN 0.0
       |       ELSE CAST(coalesce(dup_tokens, 0) AS DOUBLE) / nt END AS dup_frac,
       |  (CASE WHEN nt = 0 THEN 0.0
       |        ELSE CAST(coalesce(dup_tokens, 0) AS DOUBLE) / nt END) <= $KeepFrac
       |    AS is_kept
       |FROM n LEFT JOIN agg ON n.doc_id = agg.doc_id""".stripMargin

  /** Shared DuckDB span-removal CTE chain — the single SQL source for
    * [[spanRemovalOracle]] and TrainPrep.curatedCorpusOracle (any edit to
    * the island merge or excision rule lands in both). Expects a prior CTE
    * `n`(doc_id, w, nt); emits CTE `sr`(doc_id, nt, nrem, ct). */
  private[graft] def spanRemovalCtes: String =
    s"""g AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS s,
       |    CAST(i - 1 + ${N - 1} AS BIGINT) AS e,
       |    array_to_string(list_slice(w, i, i + ${N - 1}), ' ') AS gr
       |  FROM n, unnest(range(1, CAST(nt - $N + 2 AS BIGINT))) AS t(i)
       |  WHERE nt >= $N
       |), dup AS (
       |  SELECT gr FROM g GROUP BY gr HAVING COUNT(*) >= 2
       |), sp AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
       |      THEN 1 ELSE 0 END AS nw
       |  FROM g WHERE gr IN (SELECT gr FROM dup)
       |), isl AS (
       |  SELECT doc_id,
       |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island, s, e
       |  FROM sp
       |), ia AS (
       |  SELECT doc_id, island, MIN(s) AS mn, MAX(e) AS mx
       |  FROM isl GROUP BY doc_id, island
       |), tk AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS tok
       |  FROM n, unnest(range(1, CAST(nt + 1 AS BIGINT))) AS u(i)
       |), kk AS (
       |  SELECT tk.doc_id, pos, tok FROM tk
       |  WHERE NOT EXISTS (SELECT 1 FROM ia
       |    WHERE ia.doc_id = tk.doc_id AND tk.pos BETWEEN ia.mn AND ia.mx)
       |), cl AS (
       |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ct,
       |    CAST(COUNT(*) AS BIGINT) AS nk
       |  FROM kk GROUP BY doc_id
       |), sr AS (
       |  SELECT n.doc_id, nt, nt - coalesce(nk, 0) AS nrem, coalesce(ct, '') AS ct
       |  FROM n LEFT JOIN cl ON n.doc_id = cl.doc_id
       |)""".stripMargin

  /** DuckDB twin of [[spanRemoval]]: same islands, then tokens re-joined by
    * 0-based position with island-range exclusion and an ordered re-concat. */
  def spanRemovalOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS nt FROM d
       |), $spanRemovalCtes
       |SELECT doc_id, nt AS n_tokens, nrem AS n_removed, ct AS cleaned_text
       |FROM sr""".stripMargin
}
