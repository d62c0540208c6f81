package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning advisor (reference:
  * src/etl/optimization/intelligent_partitioning.py:84-342 —
  * `DataProfiler.analyze_data_characteristics` profiles every column's
  * cardinality / nulls / skew / temporality, `_calculate_partition_suitability`
  * scores it on a fixed ladder, and `PartitioningStrategist` maps the
  * profile to a time/hash/range strategy recommendation).
  *
  * Spark-first shape: ONE stacked (column, value) pass — the columns
  * unpivot into rows, a single groupBy(column, value) counts occurrences,
  * and a second groupBy(column) folds those counts into every profile
  * ingredient (n, distinct, nulls, top frequency). Two shuffles total for
  * ANY number of profiled columns, fully partial-aggregated — the
  * reference's per-column pandas loop is a driver-side scan per column.
  * Temporal granularity mirrors `_detect_temporal_granularity`: the modal
  * gap between consecutive DISTINCT dates (ties to the smallest gap); the
  * distinct-date frame is calendar-bounded, so its one-partition window is
  * O(days) regardless of corpus size.
  *
  * Determinism: every ingredient is an exact long (counts) and every
  * derived ratio is one fixed IEEE expression (cast-cast-divide in a pinned
  * order); the suitability ladder adds the same double literals in the same
  * left-associated order on both engines, so the scores hash-match at any
  * scale. Values travel as strings purely for the stacked union — the map
  * is injective per column, so counts are unaffected by formatting.
  *
  * The suitability ladder (the reference's, intelligent_partitioning.py:185-234):
  * distinct 10..1000 → +1.0, 2..9 → +0.6, 1001..10000 → +0.4, >10000 →
  * +0.1, <2 → +0; temporal +1.5; categorical (distinct < 100 AND ratio
  * < 0.05) +1.0; skew excess (top-share ÷ uniform-share − 1) < 0.5 → +0.8,
  * < 1 → +0.5, < 2 → +0.2; null% < 5 → +0.5, < 20 → +0.2, else −0.3;
  * capped at 5.0.
  */
object PartitionAdvisor {

  /** Candidate columns over `orders`: name → (string-projected value,
    * is_temporal). The date column collapses to DATE before stringifying so
    * both engines profile the same day grain. */
  private def orderCandidates: Seq[(String, Column, Boolean)] = Seq(
    ("o_orderdate", to_date(col("o_orderdate")).cast("string"), true),
    ("o_orderstatus", col("o_orderstatus"), false),
    ("o_orderpriority", col("o_orderpriority"), false),
    ("o_custkey", col("o_custkey").cast("string"), false),
    ("o_totalprice", col("o_totalprice").cast("string"), false),
    ("o_orderkey", col("o_orderkey").cast("string"), false))

  def partitionAdvice(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    advise(orders, orderCandidates,
      temporalGranularity(orders, to_date(col("o_orderdate"))))
  }

  /** Scale-mode twin of [[partitionAdvice]] — the ≥10× default (the
    * `_approx`-twin precedent; BASELINE records the rule and both bench
    * rows). The exact form's stacked (column, value) groupBy cannot
    * partial-aggregate NEAR-UNIQUE columns (o_orderkey / o_custkey /
    * o_totalprice: every key distinct ⇒ no map-side reduction), so at
    * 100 TB it shuffles ~3× the fact table to produce a 6-row advisory.
    * Here every data-proportional shuffle is removed:
    *
    *  - row count + null counts: exact, ONE 1-row partial-aggregated pass;
    *  - distinct counts: `approx_count_distinct` HLL sketches in the same
    *    pass (constant-size partials, ±~2.3% — the advisory ladder's
    *    thresholds are order-of-magnitude bands);
    *  - top-value frequency (skew): the stacked per-value groupBy runs on a
    *    DETERMINISTIC md5-bucket row sample (the hash_split recipe:
    *    md5(o_orderkey) hex-prefix mod `sampleMod` < `sampleKeep`, default
    *    1%), so the only per-value shuffle is over the sampled fraction.
    *    The top SHARE in the sample estimates the population top share; a
    *    top value sampled fewer than `minSampledTop` times carries no skew
    *    signal (its true share is ≲ minSampledTop·mod/keep/n — far below
    *    the ladder's 1/distinct skew bands for any column that matters), so
    *    skew defaults to 0 exactly as the exact profile reports for
    *    near-unique columns;
    *  - temporal granularity: exact (the distinct-date frame is
    *    calendar-bounded already).
    *
    * Advice tolerates estimation error by construction — the output is a
    * score ladder, not an audit — and the exact form remains the oracle
    * surface. No cross-engine oracle here (HLL estimators differ between
    * engines): bench-only, spec-pinned against the exact form's strategies.
    */
  def partitionAdviceSampled(spark: SparkSession, dir: String,
                             sampleMod: Int = 100, sampleKeep: Int = 1,
                             minSampledTop: Long = 5L): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val candidates = orderCandidates
    // pass 1: exact n + per-column null counts, HLL distincts — one row out
    // rsd 0.02: the ladder's only hard cardinality edges are order-of-
    // magnitude bands (10/100/1k/10k); 2% keeps estimates well inside them
    val aggs = candidates.flatMap { case (name, c, _) =>
      Seq(count(c).as(s"nn_$name"), approx_count_distinct(c, 0.02).as(s"d_$name"))
    }
    val prof1 = orders.agg(graft.Exact.countAll.as("n"), aggs: _*)
    // pass 2: per-value counts over the md5-bucket sample only
    val bucket = conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
      .cast("long") % sampleMod
    val sampled = stackCandidates(orders.filter(bucket < sampleKeep), candidates)
      .groupBy("column_name", "val").agg(graft.Exact.countAll.as("cnt"))
      .groupBy("column_name").agg(
        max(when(col("val").isNotNull, col("cnt"))).as("sample_top"),
        // sample_n INCLUDES null rows: the exact mode's skew_excess divides
        // top_freq by n-with-nulls, so the sampled share must estimate the
        // same denominator or a nullable column's skew inflates by n/nn.
        coalesce(sum(col("cnt")), lit(0L)).as("sample_n"))
    val rows = candidates.map { case (name, _, _) =>
      struct(lit(name).as("column_name"), col("n").as("n"),
        col(s"nn_$name").as("nn"), col(s"d_$name").as("distinct_count"))
    }
    val perCol = prof1.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
    val nD = col("n").cast("double")
    val topShare = col("sample_top").cast("double") / col("sample_n").cast("double")
    val d1 = perCol.join(sampled, Seq("column_name"), "left") // 6-row join
      .withColumn("is_temporal", temporalCase(candidates))
      .withColumn("null_pct", (col("n") - col("nn")).cast("double") * lit(100.0) / nD)
      .withColumn("cardinality_ratio", col("distinct_count").cast("double") / nD)
      .withColumn("skew_excess",
        when(col("sample_top").isNotNull && col("sample_top") >= minSampledTop,
          topShare * col("distinct_count").cast("double") - lit(1.0))
          .otherwise(lit(0.0)))
      .select("column_name", "n", "distinct_count", "null_pct",
        "cardinality_ratio", "skew_excess", "is_temporal")
    scoreAdvice(d1, temporalGranularity(orders, to_date(col("o_orderdate"))))
  }

  /** Modal gap (days) between consecutive distinct values of `dateCol` —
    * 1-row frame. The unpartitioned window runs over DISTINCT dates:
    * calendar-bounded (O(days)), not data-proportional — and the
    * boundedFrame guard raise_errors rather than rely on that reading. */
  private def temporalGranularity(df: DataFrame, dateCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = df.select(dateCol.as("d")).where(col("d").isNotNull).distinct()
    val iv = dd.withColumn("iv", RankOps.boundedFrame("partition_advice_granularity",
        datediff(col("d"), lag(col("d"), 1).over(Window.orderBy(col("d"))))))
      .where(col("iv").isNotNull)
    iv.groupBy("iv").count()
      .orderBy(col("count").desc, col("iv").asc).limit(1)
      .select(col("iv").cast("long").as("modal_iv"))
  }

  /** The stack() unpivot projection shared by the exact and sampled modes:
    * one scan, every candidate column becomes a (column_name, val) row. */
  private def stackCandidates(df: DataFrame,
                              candidates: Seq[(String, Column, Boolean)]): DataFrame =
    df.select(candidates.map(c => c._2.as(c._1)): _*)
      .select(expr("stack(" + candidates.length + ", " +
        candidates.map { case (name, _, _) => s"'$name', `$name`" }.mkString(", ") +
        ") AS (column_name, val)"))

  private def temporalCase(candidates: Seq[(String, Column, Boolean)]): Column =
    candidates.foldLeft(lit(false)) { case (acc, (name, _, t)) =>
      when(col("column_name") === name, lit(t)).otherwise(acc)
    }

  private def advise(df: DataFrame, candidates: Seq[(String, Column, Boolean)],
                     gran: DataFrame): DataFrame = {
    // ONE scan: the stack() generator unpivots every candidate column per
    // row — a union of per-column selects would re-scan the table once per
    // column (6 scans of a 100 TB fact instead of 1)
    val stacked = stackCandidates(df, candidates)
    val perValue = stacked.groupBy("column_name", "val").agg(graft.Exact.countAll.as("cnt"))
    val prof = perValue.groupBy("column_name").agg(
      sum(col("cnt")).as("n"),
      sum(when(col("val").isNotNull, lit(1L)).otherwise(lit(0L))).as("distinct_count"),
      coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("null_count"),
      max(when(col("val").isNotNull, col("cnt"))).as("top_freq"))
    val nD = col("n").cast("double")
    val d1 = prof
      .withColumn("is_temporal", temporalCase(candidates))
      .withColumn("null_pct", col("null_count").cast("double") * lit(100.0) / nD)
      .withColumn("cardinality_ratio", col("distinct_count").cast("double") / nD)
      .withColumn("skew_excess",
        col("top_freq").cast("double") * col("distinct_count").cast("double") / nD - lit(1.0))
    scoreAdvice(d1, gran)
  }

  /** The shared suitability/strategy ladder tail: takes a per-column frame
    * carrying (column_name, n, distinct_count, null_pct, cardinality_ratio,
    * skew_excess, is_temporal) — however those ingredients were computed —
    * and emits the advisory. */
  private def scoreAdvice(d1: DataFrame, gran: DataFrame): DataFrame = {
    val advice = d1.crossJoin(gran)
      .withColumn("is_categorical",
        col("distinct_count") < 100 && col("cardinality_ratio") < 0.05)
      .withColumn("granularity",
        when(!col("is_temporal"), lit("none"))
          .when(col("modal_iv") <= 1, lit("day"))
          .when(col("modal_iv") <= 7, lit("week"))
          .when(col("modal_iv") <= 31, lit("month"))
          .when(col("modal_iv") <= 92, lit("quarter"))
          .otherwise(lit("year")))
      .withColumn("suitability", least(
        (when(col("distinct_count") < 2, lit(0.0))
          .when(col("distinct_count") >= 10 && col("distinct_count") <= 1000, lit(1.0))
          .when(col("distinct_count") < 10, lit(0.6))
          .when(col("distinct_count") <= 10000, lit(0.4))
          .otherwise(lit(0.1))
          + when(col("is_temporal"), lit(1.5)).otherwise(lit(0.0)))
          + when(col("is_categorical"), lit(1.0)).otherwise(lit(0.0))
          + (when(col("skew_excess") < 0.5, lit(0.8))
            .when(col("skew_excess") < 1.0, lit(0.5))
            .when(col("skew_excess") < 2.0, lit(0.2)).otherwise(lit(0.0)))
          + (when(col("null_pct") < 5.0, lit(0.5))
            .when(col("null_pct") < 20.0, lit(0.2)).otherwise(lit(-0.3))),
        lit(5.0)))
      .withColumn("strategy",
        when(col("is_temporal"), lit("time_based"))
          .when(col("is_categorical") && col("skew_excess") < 1.0, lit("list"))
          .when(col("distinct_count") > 10000, lit("hash"))
          .when(col("distinct_count") >= 2, lit("range"))
          .otherwise(lit("none")))
      .withColumn("partition_count",
        when(col("strategy") === "time_based", least(col("distinct_count"), lit(365L)))
          .when(col("strategy") === "list", col("distinct_count"))
          .when(col("strategy") === "hash",
            least(greatest(expr("distinct_count div 64"), lit(8L)), lit(1024L)))
          .when(col("strategy") === "range", lit(32L))
          .otherwise(lit(0L)))
    advice.select("column_name", "n", "distinct_count", "null_pct",
      "cardinality_ratio", "skew_excess", "is_temporal", "is_categorical",
      "granularity", "suitability", "strategy", "partition_count")
  }

  /** DuckDB oracle: the stacked union, the two-level count fold, the modal
    * date gap, and the identical ladder arithmetic. */
  def partitionAdviceOracle: String = {
    val stack = Seq(
      "SELECT 'o_orderdate' AS column_name, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS val FROM orders",
      "SELECT 'o_orderstatus', o_orderstatus FROM orders",
      "SELECT 'o_orderpriority', o_orderpriority FROM orders",
      "SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders",
      "SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders",
      "SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM orders"
    ).mkString("\n  UNION ALL ")
    s"""WITH stacked AS (
       |  $stack
       |), pv AS (
       |  SELECT column_name, val, COUNT(*) AS cnt FROM stacked GROUP BY 1, 2
       |), prof AS (
       |  SELECT column_name,
       |    CAST(SUM(cnt) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS distinct_count,
       |    CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN cnt END), 0) AS BIGINT) AS null_count,
       |    CAST(MAX(CASE WHEN val IS NOT NULL THEN cnt END) AS BIGINT) AS top_freq
       |  FROM pv GROUP BY 1
       |), dd AS (
       |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders WHERE o_orderdate IS NOT NULL
       |), di AS (
       |  SELECT datediff('day', lag(d) OVER (ORDER BY d), d) AS iv FROM dd
       |), gran AS (
       |  SELECT CAST(iv AS BIGINT) AS modal_iv FROM (
       |    SELECT iv, COUNT(*) AS c FROM di WHERE iv IS NOT NULL GROUP BY 1)
       |  ORDER BY c DESC, iv LIMIT 1
       |), d1 AS (
       |  SELECT p.*, modal_iv,
       |    column_name = 'o_orderdate' AS is_temporal,
       |    CAST(null_count AS DOUBLE) * 100.0 / CAST(n AS DOUBLE) AS null_pct,
       |    CAST(distinct_count AS DOUBLE) / CAST(n AS DOUBLE) AS cardinality_ratio,
       |    CAST(top_freq AS DOUBLE) * CAST(distinct_count AS DOUBLE) / CAST(n AS DOUBLE) - 1.0 AS skew_excess
       |  FROM prof p CROSS JOIN gran
       |), d2 AS (
       |  SELECT *, distinct_count < 100 AND cardinality_ratio < 0.05 AS is_categorical,
       |    CASE WHEN NOT is_temporal THEN 'none'
       |         WHEN modal_iv <= 1 THEN 'day'
       |         WHEN modal_iv <= 7 THEN 'week'
       |         WHEN modal_iv <= 31 THEN 'month'
       |         WHEN modal_iv <= 92 THEN 'quarter'
       |         ELSE 'year' END AS granularity
       |  FROM d1
       |), d3 AS (
       |  -- each ladder CASE casts to DOUBLE: bare literals are DECIMAL in
       |  -- DuckDB and decimal addition is exact, which would diverge from
       |  -- Spark's IEEE double sum (0.6+1.0+0.8+0.5 = 2.9000000000000004)
       |  SELECT *, LEAST(
       |    (CAST(CASE WHEN distinct_count < 2 THEN 0.0
       |          WHEN distinct_count >= 10 AND distinct_count <= 1000 THEN 1.0
       |          WHEN distinct_count < 10 THEN 0.6
       |          WHEN distinct_count <= 10000 THEN 0.4
       |          ELSE 0.1 END AS DOUBLE)
       |     + CAST(CASE WHEN is_temporal THEN 1.5 ELSE 0.0 END AS DOUBLE))
       |     + CAST(CASE WHEN is_categorical THEN 1.0 ELSE 0.0 END AS DOUBLE)
       |     + CAST(CASE WHEN skew_excess < 0.5 THEN 0.8
       |            WHEN skew_excess < 1.0 THEN 0.5
       |            WHEN skew_excess < 2.0 THEN 0.2 ELSE 0.0 END AS DOUBLE)
       |     + CAST(CASE WHEN null_pct < 5.0 THEN 0.5
       |            WHEN null_pct < 20.0 THEN 0.2 ELSE -0.3 END AS DOUBLE),
       |    CAST(5.0 AS DOUBLE)) AS suitability,
       |    CASE WHEN is_temporal THEN 'time_based'
       |         WHEN distinct_count < 100 AND cardinality_ratio < 0.05 AND skew_excess < 1.0 THEN 'list'
       |         WHEN distinct_count > 10000 THEN 'hash'
       |         WHEN distinct_count >= 2 THEN 'range'
       |         ELSE 'none' END AS strategy
       |  FROM d2
       |)
       |SELECT column_name, n, distinct_count, null_pct, cardinality_ratio,
       |  skew_excess, is_temporal, is_categorical, granularity, suitability,
       |  strategy,
       |  CAST(CASE WHEN strategy = 'time_based' THEN LEAST(distinct_count, 365)
       |       WHEN strategy = 'list' THEN distinct_count
       |       WHEN strategy = 'hash' THEN LEAST(GREATEST(distinct_count // 64, 8), 1024)
       |       WHEN strategy = 'range' THEN 32
       |       ELSE 0 END AS BIGINT) AS partition_count
       |FROM d3""".stripMargin
  }
}
