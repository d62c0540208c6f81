package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram LM perplexity filtering — the CCNet recipe (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): score every document by its cross-entropy under a character
  * n-gram language model and split the corpus into HEAD / MIDDLE / TAIL
  * perplexity terciles (CCNet keeps head+middle for LM training). The
  * trigram-coverage filter (`lm_quality_score`) asks "are this document's
  * grams in the vocabulary?"; this operator asks the sharper probabilistic
  * question "how LIKELY is this document under the gram distribution?" —
  * gibberish with common characters passes coverage but lands in the tail
  * here.
  *
  * The model is add-one-smoothed trigram unigram-of-grams:
  * p(g) = (c(g)+1)/(T+V) with c = corpus gram count, T = total gram mass,
  * V = distinct grams. Self-trained on the corpus (the lm_quality_score
  * convention — a real deployment swaps in a model fit on a trusted
  * corpus without changing the plan); ln through
  * [[graft.operators.Drift.portableLn]] so both engines share every bit.
  *
  * Scale shape (the DSIR recipe, corpus-sized work in exactly two
  * passes): pass 1 builds the gram model — the count frame is bounded by
  * charset³, NOT corpus size, so the ln-ladder runs on a vocab-bounded
  * frame that then broadcasts; pass 2 re-grams the corpus, joins the
  * broadcast model, and folds each document's Σ n·ln p over
  * gram-key-SORTED terms (pinned double summation order — the packed
  * trigram long and the oracle's ord()-built key order identically).
  * Ranking into terciles is the distributed range-partitioned rank
  * ([[graft.operators.RankOps]]), never a single-partition window. */
object Perplexity {

  /** (doc_id, n_grams, sum_ll, cross_entropy, ppl_bucket): sum_ll =
    * Σ n·ln p(g) (≤ 0), cross_entropy = −sum_ll/n_grams (nats/gram),
    * bucket ∈ head|middle|tail by cross-entropy terciles (head =
    * lowest = most natural), `empty` for docs with no grams. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Drift, RankOps}
    graft.functions.TextKernels.register(spark)
    val d = Tables.documents(spark, dir)
      .withColumn("__c", lower(trim(col("text"))))
      .withColumn("n_grams",
        when(col("__c").isNotNull && length(col("__c")) >= 3,
          (length(col("__c")) - 2).cast("long")).otherwise(0L))
      .select(col("doc_id"), col("__c"), col("n_grams"))
    // explode_outer: the InferFiltersFromGenerate dodge (lm_quality_score)
    val grams = d.filter(col("n_grams") > 0)
      .select(col("doc_id"),
        explode_outer(expr("trigram_keys(__c, n_grams)")).as("g"))

    // pass 1: the model — vocab-bounded (≤ charset³ rows)
    val cg = grams.groupBy("g").agg(count(lit(1)).as("c"))
    val tot = cg.agg(sum(col("c")).as("T"), count(lit(1)).as("V"))
    val lnp = Drift.withPortableLn(
      cg.crossJoin(broadcast(tot))
        .withColumn("__p",
          (col("c") + lit(1L)).cast("double") /
            (col("T") + col("V")).cast("double")),
      "__p", "lnp")
      .select(col("g"), col("lnp"))

    // pass 2: per-doc fold over gram-key-sorted terms (pinned order)
    val docg = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
    val sums = docg.join(broadcast(lnp), "g")
      .withColumn("term", col("n").cast("double") * col("lnp"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("g"), col("term"))).as("__cells"))
      .withColumn("sum_ll",
        aggregate(sort_array(col("__cells")), lit(0.0),
          (acc, x) => acc + x.getField("term")))
      .select(col("doc_id"), col("sum_ll"))

    val scored = d.join(sums, Seq("doc_id"), "left")
      .withColumn("cross_entropy",
        when(col("n_grams") > 0, -col("sum_ll") / col("n_grams").cast("double")))
    // terciles over the scored docs (distributed rank; CCNet's head = low CE)
    val (ranked, n) = RankOps.withGlobalRankCounted(
      scored.filter(col("n_grams") > 0), "__rk",
      Seq(col("cross_entropy"), col("doc_id")))
    val bucketed = ranked.withColumn("ppl_bucket",
      when(col("__rk") * 3 <= n, "head")
        .when(col("__rk") * 3 <= 2 * n, "middle")
        .otherwise("tail"))
    bucketed.select(col("doc_id"), col("n_grams"), col("sum_ll"),
        col("cross_entropy"), col("ppl_bucket"))
      .unionByName(scored.filter(col("n_grams") === 0)
        .select(col("doc_id"), col("n_grams"),
          lit(null).cast("double").as("sum_ll"),
          lit(null).cast("double").as("cross_entropy"),
          lit("empty").as("ppl_bucket")))
      .orderBy("doc_id")
  }

  /** DuckDB oracle: the substr gram build (lm_quality_score's), the same
    * smoothing + staged ln ladder, the list_sort/list_reduce fold keyed by
    * the ord()-packed trigram long (identical order to the engine's packed
    * key for BMP text — the corpus contract substr already relies on),
    * and a row_number tercile replay. */
  def perplexityOracle: String = {
    import graft.operators.Drift
    val key = "CAST(ord(substr(c, i, 1)) AS BIGINT) * 4398046511104 + " +
      "CAST(ord(substr(c, i + 1, 1)) AS BIGINT) * 2097152 + " +
      "CAST(ord(substr(c, i + 2, 1)) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, lower(trim(text)) AS c,
       |    CAST(CASE WHEN lower(trim(text)) IS NOT NULL AND len(lower(trim(text))) >= 3
       |      THEN len(lower(trim(text))) - 2 ELSE 0 END AS BIGINT) AS n_grams
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, $key AS g
       |  FROM (SELECT doc_id, c, unnest(range(1, len(c) - 1)) AS i
       |        FROM d WHERE n_grams > 0)
       |), cg AS (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS cn FROM g GROUP BY 1
       |), tot AS (
       |  SELECT CAST(SUM(cn) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM cg
       |), p0 AS (
       |  SELECT g, CAST(cn + 1 AS DOUBLE) / CAST(t + v AS DOUBLE) AS p
       |  FROM cg CROSS JOIN tot
       |), p1 AS (
       |  SELECT g, ${Drift.lnLadderSqlK("p")} AS k, ${Drift.lnLadderSqlM("p")} AS m
       |  FROM p0
       |), p2 AS (
       |  SELECT g, k, (m - 1.0) / (m + 1.0) AS z FROM p1
       |), p3 AS (
       |  SELECT g, k, z, z * z AS z2 FROM p2
       |), lnp AS (
       |  SELECT g,
       |    (k * CAST(${Drift.Ln2} AS DOUBLE)) +
       |      ((CAST(2.0 AS DOUBLE) * z) * ${Drift.lnHornerSql("z2")}) AS lnp
       |  FROM p3
       |), dg AS (
       |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1, 2
       |), trm AS (
       |  SELECT dg.doc_id, dg.g, CAST(n AS DOUBLE) * lnp AS term
       |  FROM dg JOIN lnp USING (g)
       |), sums AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      list_sort(list({'g': g, 'term': term})), x -> x.term)),
       |      (a, b) -> a + b) AS sum_ll
       |  FROM trm GROUP BY doc_id
       |), scored AS (
       |  SELECT d.doc_id, d.n_grams, sums.sum_ll,
       |    CASE WHEN d.n_grams > 0
       |      THEN -(sums.sum_ll) / CAST(d.n_grams AS DOUBLE) END AS cross_entropy
       |  FROM d LEFT JOIN sums USING (doc_id)
       |), rk AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY cross_entropy, doc_id) AS BIGINT) AS r,
       |    (SELECT COUNT(*) FROM scored WHERE n_grams > 0) AS nn
       |  FROM scored WHERE n_grams > 0
       |)
       |SELECT doc_id, n_grams, sum_ll, cross_entropy,
       |  CASE WHEN r * 3 <= nn THEN 'head'
       |       WHEN r * 3 <= 2 * nn THEN 'middle'
       |       ELSE 'tail' END AS ppl_bucket
       |FROM rk
       |UNION ALL
       |SELECT doc_id, n_grams, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 'empty'
       |FROM scored WHERE n_grams = 0
       |ORDER BY doc_id""".stripMargin
  }
}
