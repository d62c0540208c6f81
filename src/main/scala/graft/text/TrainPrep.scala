package graft.text

import graft.Tables
import graft.Exact.countAll
import graft.operators.RankOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators the reference's ETL stops short of
  * but a large-scale LLM-data pipeline needs as first-class queries:
  * deterministic hash splits, class balancing, eval-set contamination
  * checks, Gopher-style repetition filters, fixed-token-budget sequence
  * packing, and source-mixture weighting. All run over the `documents`
  * table; every statistic is exact integer / fixed-order arithmetic so each
  * query is hash-comparable against a DuckDB oracle.
  *
  * Scale notes per operator are on the methods; the common theme is that
  * per-document statistics are pure projections (no shuffle), corpus-level
  * statistics are single grouped aggregates, and anything needing a global
  * order goes through RankOps' range-repartition machinery — never a
  * single-partition window.
  */
object TrainPrep {

  /** Whitespace tokens, the corpus-wide convention (TextOps). */
  private def withWords(df: DataFrame): DataFrame =
    df.withColumn("__w", expr("""split(lower(trim(text)), '\\s+')"""))

  private val hexDigits = "0123456789abcdef"

  /** First 4 md5 hex chars of the doc id as an integer 0..65535 — the
    * deterministic, engine-portable split key. Seeding on the STABLE id
    * (not the text) keeps a document's split assignment fixed across
    * re-crawls that mutate its content — the property that keeps eval sets
    * honest over pipeline generations. */
  private def hashBucket(id: Column, mod: Int): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % mod)

  /** DuckDB twin of hashBucket (no base-16 conv builtin — digit-fold the
    * hex, the chunk_embeddings recipe). */
  private def hashBucketSql(idExpr: String, mod: Int): String =
    s"""CAST(list_sum(list_transform(range(1, 5), j ->
       |    (strpos('$hexDigits', substring(md5(CAST($idExpr AS VARCHAR)), j, 1)) - 1)
       |      * (16.0 ** (4 - j)))) AS BIGINT) % $mod""".stripMargin

  // ---------------------------------------------------------------- split

  /** Deterministic 80/10/10 train/val/test assignment by md5 bucket of the
    * doc id. A pure projection — no shuffle, no state, reproducible on any
    * engine; the split of a 100 TB corpus is decided row-locally at scan
    * speed. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("source"),
      hashBucket(col("doc_id"), 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))

  def hashSplitOracle: String =
    s"""SELECT doc_id, lang, source,
       |  ${hashBucketSql("doc_id", 100)} AS bucket,
       |  CASE WHEN ${hashBucketSql("doc_id", 100)} < 80 THEN 'train'
       |       WHEN ${hashBucketSql("doc_id", 100)} < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  // -------------------------------------------------------------- balance

  /** Class-balanced downsample: keep, per language, the `m` documents with
    * the smallest md5 rank, where `m` is the size of the smallest class —
    * the standard majority-downsampling step before training a classifier.
    *
    * Scale shape: the per-class rank is NOT a `Window.partitionBy(lang)`
    * (5 classes ⇒ 5 single-threaded partitions at 100 TB). Instead one
    * global range-repartitioned rank over (lang, hash, id) — a distributed
    * sort — minus per-class offsets derived from the ≤ #classes-row count
    * frame (driver-side, like StarSchema's 1-row collect). */
  def classBalance(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      md5(col("doc_id").cast("string")).as("__hk"))
    val ranked = RankOps.withGlobalRank(keyed, "__grank",
      Seq(col("lang").asc, col("__hk").asc, col("doc_id").asc))
    val counts = keyed.groupBy("lang").agg(countAll.as("__c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val m = counts.map(_._2).min
    var acc = 0L
    val offsets = counts.map { case (l, c) => val row = (l, acc); acc += c; row }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("lang", "__off"))
    ranked.join(offDf, "lang")
      .withColumn("class_rank", (col("__grank") - col("__off")).cast("long"))
      .withColumn("is_kept", col("class_rank") <= m)
      .select("doc_id", "lang", "class_rank", "is_kept")
  }

  def classBalanceOracle: String =
    """WITH k AS (
      |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents
      |), r AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS BIGINT)
      |      AS class_rank
      |  FROM k
      |), m AS (
      |  SELECT MIN(c) AS m FROM (SELECT COUNT(*) AS c FROM k GROUP BY lang)
      |)
      |SELECT doc_id, lang, class_rank, class_rank <= m AS is_kept
      |FROM r, m""".stripMargin

  // -------------------------------------------------------- contamination

  /** Benchmark-contamination check: word 5-gram overlap between each corpus
    * document and a held-out eval set (docs with id ≡ 0 mod 97 stand in for
    * the benchmark). A document sharing > 20% of its distinct 5-grams with
    * the eval set is flagged — the standard n-gram decontamination test run
    * before pretraining.
    *
    * Scale shape: distinct 5-grams per doc are a pure projection; the
    * overlap is ONE left-semi join on the gram string (shuffle keyed by
    * gram — fine at any corpus size) followed by a per-doc count. Real eval
    * sets are benchmark-sized, so the semi-join's build side is small and
    * AQE turns it into a broadcast automatically; the shuffle formulation
    * here is the shape that still works when the "eval set" is itself huge
    * (e.g. decontaminating against an entire held-out shard). */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    val d = withWords(Tables.documents(spark, dir))
      .withColumn("__grams",
        when(size(col("__w")) >= 5, array_distinct(
          expr("transform(sequence(1, size(__w) - 4), i -> concat_ws(' ', slice(__w, i, 5)))")))
          .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("__grams"))
    val evalGrams = d.filter(col("doc_id") % 97 === 0)
      .select(explode(col("__grams")).as("g")).distinct()
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    val overlap = corpus.select(col("doc_id"), explode(col("__grams")).as("g"))
      .join(evalGrams, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(countAll.as("__ov"))
    corpus.join(overlap, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("__grams")).cast("long").as("n_ngrams"),
        coalesce(col("__ov"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        when(col("n_ngrams") === 0, 0.0)
          .otherwise(col("n_overlap").cast("double") / col("n_ngrams")))
      .withColumn("is_contaminated", col("overlap_frac") > 0.2)
  }

  def contaminationCheckOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 5 THEN list_distinct(list_transform(range(1, len(toks) - 3),
      |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))
      |    ELSE []::VARCHAR[] END AS grams
      |  FROM t
      |), eg AS (
      |  SELECT DISTINCT unnest(grams) AS gr FROM g WHERE doc_id % 97 = 0
      |), cg AS (
      |  SELECT doc_id, unnest(grams) AS gr FROM g WHERE doc_id % 97 <> 0
      |), ov AS (
      |  SELECT doc_id, COUNT(*) AS c FROM cg WHERE gr IN (SELECT gr FROM eg) GROUP BY 1
      |)
      |SELECT g.doc_id, CAST(len(grams) AS BIGINT) AS n_ngrams,
      |  coalesce(c, 0) AS n_overlap,
      |  CASE WHEN len(grams) = 0 THEN 0.0
      |       ELSE CAST(coalesce(c, 0) AS DOUBLE) / len(grams) END AS overlap_frac,
      |  (CASE WHEN len(grams) = 0 THEN 0.0
      |        ELSE CAST(coalesce(c, 0) AS DOUBLE) / len(grams) END) > 0.2 AS is_contaminated
      |FROM g LEFT JOIN ov ON g.doc_id = ov.doc_id
      |WHERE g.doc_id % 97 <> 0""".stripMargin

  // ----------------------------------------------------------- repetition

  /** Gopher-style repetition quality filters (Rae et al. 2021 §A1.1, re-cut
    * for single-line docs): distinct-word ratio, top-unigram fraction,
    * top-bigram fraction, and the fraction of trigrams that are duplicates.
    * The keep rule mirrors the paper's AND-of-thresholds shape.
    *
    * Scale shape: every statistic is computed INSIDE the row with
    * higher-order array functions (distinct → per-distinct-element counts →
    * max/sum) — a pure codegen'd projection, zero shuffles, O(words ×
    * distinct words) per doc. The explode-and-groupBy alternative would
    * shuffle the whole tokenized corpus. */
  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = withWords(Tables.documents(spark, dir))
      .withColumn("__n", size(col("__w")).cast("long"))
      // per-distinct-element occurrence counts, reused for top-k fractions
      .withColumn("__wc", expr("transform(array_distinct(__w), u -> size(filter(__w, x -> x = u)))"))
      .withColumn("__g2",
        when(col("__n") >= 2,
          expr("transform(sequence(1, size(__w) - 1), i -> concat_ws(' ', slice(__w, i, 2)))"))
          .otherwise(array().cast("array<string>")))
      .withColumn("__g2c", expr("transform(array_distinct(__g2), u -> size(filter(__g2, x -> x = u)))"))
      .withColumn("__g3",
        when(col("__n") >= 3,
          expr("transform(sequence(1, size(__w) - 2), i -> concat_ws(' ', slice(__w, i, 3)))"))
          .otherwise(array().cast("array<string>")))
      .withColumn("__g3c", expr("transform(array_distinct(__g3), u -> size(filter(__g3, x -> x = u)))"))
    d.select(
      col("doc_id"), col("__n").as("n_words"),
      size(col("__wc")).cast("long").as("n_distinct"),
      (size(col("__wc")).cast("double") / col("__n")).as("distinct_ratio"),
      array_max(col("__wc")).cast("long").as("top_word_count"),
      (array_max(col("__wc")).cast("double") / col("__n")).as("top_word_frac"),
      when(size(col("__g2")) === 0, 0.0)
        .otherwise(array_max(col("__g2c")).cast("double") / size(col("__g2")))
        .as("top_bigram_frac"),
      // (max − 1)/count: zero for any repetition-free doc regardless of
      // length — the raw fraction is 1/(n−1) even with no repetition, which
      // would auto-filter every short doc
      when(size(col("__g2")) === 0, 0.0)
        .otherwise((array_max(col("__g2c")) - 1).cast("double") / size(col("__g2")))
        .as("excess_bigram_frac"),
      when(size(col("__g3")) === 0, 0.0)
        .otherwise(
          expr("aggregate(__g3c, 0, (a, c) -> a + IF(c > 1, c, 0))").cast("double")
            / size(col("__g3")))
        .as("dup_trigram_frac"))
      .withColumn("is_kept",
        col("distinct_ratio") >= 0.2 && col("top_word_frac") <= 0.2 &&
          col("excess_bigram_frac") <= 0.1 && col("dup_trigram_frac") <= 0.3)
  }

  def repetitionFilterOracle: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
      |), s AS (
      |  SELECT doc_id, len(w) AS n,
      |    list_transform(list_distinct(w), u -> len(list_filter(w, x -> x = u))) AS wc,
      |    CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
      |      i -> concat_ws(' ', w[i], w[i+1])) ELSE []::VARCHAR[] END AS g2,
      |    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1),
      |      i -> concat_ws(' ', w[i], w[i+1], w[i+2])) ELSE []::VARCHAR[] END AS g3
      |  FROM t
      |), c AS (
      |  SELECT doc_id, n, wc, g2, g3,
      |    list_transform(list_distinct(g2), u -> len(list_filter(g2, x -> x = u))) AS g2c,
      |    list_transform(list_distinct(g3), u -> len(list_filter(g3, x -> x = u))) AS g3c
      |  FROM s
      |), f AS (
      |  SELECT doc_id, CAST(n AS BIGINT) AS n_words,
      |    CAST(len(wc) AS BIGINT) AS n_distinct,
      |    CAST(len(wc) AS DOUBLE) / n AS distinct_ratio,
      |    CAST(list_max(wc) AS BIGINT) AS top_word_count,
      |    CAST(list_max(wc) AS DOUBLE) / n AS top_word_frac,
      |    CASE WHEN len(g2) = 0 THEN 0.0
      |         ELSE CAST(list_max(g2c) AS DOUBLE) / len(g2) END AS top_bigram_frac,
      |    CASE WHEN len(g2) = 0 THEN 0.0
      |         ELSE CAST(list_max(g2c) - 1 AS DOUBLE) / len(g2) END AS excess_bigram_frac,
      |    CASE WHEN len(g3) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(g3c,
      |                c -> CASE WHEN c > 1 THEN c ELSE 0 END)) AS DOUBLE) / len(g3)
      |    END AS dup_trigram_frac
      |  FROM c
      |)
      |SELECT *,
      |  distinct_ratio >= 0.2 AND top_word_frac <= 0.2
      |    AND excess_bigram_frac <= 0.1 AND dup_trigram_frac <= 0.3 AS is_kept
      |FROM f""".stripMargin

  // -------------------------------------------------------------- packing

  /** GPT-style sequence packing: concatenate the token stream in doc-id
    * order and cut it into fixed `budget`-token blocks; report per-block
    * document spans and utilization. This is the packing accountant a
    * pretraining data loader needs — which docs land in which block, how
    * many are cut at block boundaries, how full the final block is.
    *
    * Scale shape: the token-offset prefix sum is RankOps.withGlobalCumSum
    * (range repartition + ≤ #partitions driver offsets — a distributed
    * prefix sum, not a single-partition window); each doc then explodes
    * into only the blocks it overlaps (≤ tokens/budget + 1 rows), and one
    * grouped aggregate on block id builds the report. */
  def sequencePacking(spark: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    val b = lit(budget.toLong)
    val toks = withWords(Tables.documents(spark, dir))
      .select(col("doc_id"), size(col("__w")).cast("long").as("__nt"))
      .filter(col("__nt") > 0)
    val cum = RankOps.withGlobalCumSum(toks, "__cum", col("__nt"), Seq(col("doc_id").asc))
      .withColumn("__st", col("__cum") - col("__nt"))
    val spans = cum.select(
      col("doc_id"), col("__st"), col("__cum"),
      explode(expr(s"sequence(__st div ${budget}L, (__cum - 1) div ${budget}L)"))
        .as("pack_id"))
    spans.groupBy(col("pack_id"))
      .agg(
        countAll.as("n_docs"),
        sum(least(col("__cum"), (col("pack_id") + 1) * b)
          - greatest(col("__st"), col("pack_id") * b)).cast("long").as("n_tokens"),
        sum(when(col("__st") < col("pack_id") * b || col("__cum") > (col("pack_id") + 1) * b, 1L)
          .otherwise(0L)).cast("long").as("n_split_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("utilization", col("n_tokens").cast("double") / budget.toDouble)
  }

  def sequencePackingOracle: String =
    """WITH t AS (
      |  SELECT doc_id, len(string_split_regex(lower(trim(text)), '\s+')) AS nt FROM documents
      |), c AS (
      |  SELECT doc_id, nt,
      |    CAST(SUM(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum
      |  FROM t WHERE nt > 0
      |), e AS (
      |  SELECT doc_id, cum - nt AS st, cum,
      |    unnest(generate_series((cum - nt) // 256, (cum - 1) // 256)) AS pack_id
      |  FROM c
      |)
      |SELECT CAST(pack_id AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
      |  CAST(SUM(least(cum, (pack_id + 1) * 256) - greatest(st, pack_id * 256)) AS BIGINT)
      |    AS n_tokens,
      |  CAST(SUM(CASE WHEN st < pack_id * 256 OR cum > (pack_id + 1) * 256 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_split_docs,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  CAST(SUM(least(cum, (pack_id + 1) * 256) - greatest(st, pack_id * 256)) AS DOUBLE)
      |    / 256.0 AS utilization
      |FROM e GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- mixing

  /** Source-mixture weighting: per-source token mass and the sampling
    * weight that flattens the mixture to uniform-over-sources — the knob a
    * pretraining run turns to up/down-weight domains. One grouped aggregate
    * plus a broadcast 1-row total; weight = total / (k · source_tokens) is
    * a single IEEE division from exact longs. */
  def mixingWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = withWords(Tables.documents(spark, dir))
      .groupBy(col("source"))
      .agg(countAll.as("n_docs"), sum(size(col("__w")).cast("long")).as("n_tokens"))
    val totals = broadcast(perSrc.agg(
      sum(col("n_tokens")).as("__tt"), countAll.as("__k")))
    perSrc.crossJoin(totals)
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__tt")).as("token_share"),
        (col("__tt").cast("double") / (col("__k") * col("n_tokens"))).as("mix_weight"))
  }

  def mixingWeightsOracle: String =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt, COUNT(*) AS k FROM s
      |)
      |SELECT source, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / tt AS token_share,
      |  CAST(tt AS DOUBLE) / (k * n_tokens) AS mix_weight
      |FROM s, t""".stripMargin
}
