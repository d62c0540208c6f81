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
  * not 1000² pairs.
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

  /** (doc_id, s, e) maximal duplicated islands, token-indexed [s, e]. */
  def islands(spark: SparkSession, dir: String): DataFrame = {
    val d = withWords(Tables.documents(spark, dir))
      .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("__n"))
    val grams = d.filter(col("__n") >= N)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, cast(__n as int) - $N), i -> concat_ws(' ', slice(__w, i + 1, $N)))"))
          .as(Seq("s", "g")))
    val dupGrams = grams.groupBy("g").agg(countAll.as("__c"))
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

  /** Per-document rollup: token count, island count, duplicated-token mass
    * and fraction, and the keep decision at [[KeepFrac]]. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val d = withWords(Tables.documents(spark, dir))
      .select(col("doc_id"), size(col("__w")).cast("long").as("n_tokens"))
    val perDoc = islands(spark, dir)
      .groupBy("doc_id")
      .agg(countAll.as("n_dup_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    d.join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("dup_tokens").cast("double") / col("n_tokens")))
      .withColumn("is_kept", col("dup_frac") <= KeepFrac)
  }

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
}
