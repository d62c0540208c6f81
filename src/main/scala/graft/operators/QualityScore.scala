package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-dimension scoring engine (reference:
  * src/data_quality/core/data_quality_engine.py:473-739 evaluates rules
  * under named dimensions — completeness, accuracy, consistency, uniqueness,
  * validity, timeliness — and `_calculate_quality_metrics`:739-815 rolls
  * them into severity-weighted per-dimension scores, a dimension-weighted
  * overall score, and a quality-level band).
  *
  * The reference walks driver-side row dicts per rule; here every rule is a
  * Catalyst predicate and the whole scorecard — all rules across all
  * dimensions plus the uniqueness distinct-count — is ONE aggregate pass
  * over the sales fact (single shuffle-free global aggregate; the fact join
  * itself shuffles on its keys as usual). Severity weights and dimension
  * weights are the reference's own tables (`:745`, `:752-762`); dimensions
  * it defines but this fact has no rules for (reliability, relevance,
  * conformity) take the reference's 0.5 default in the overall rollup.
  *
  * Scoring contract (row-level analog of the reference's issue-level
  * formula): dimension impact = Σ severity_weight(r) · fail_rate(r), score =
  * max(0, 1 − impact / n_rules); overall = Σ dimension_weight · score.
  */
object QualityScore {

  final case class DimRule(name: String, dimension: String, severity: String,
                           passes: Column, sql: String)

  val severityWeights: Map[String, Double] =
    Map("critical" -> 1.0, "high" -> 0.8, "medium" -> 0.5, "low" -> 0.2)

  /** Reference dimension weights (data_quality_engine.py:752-762). */
  val dimensionWeights: Seq[(String, Double)] = Seq(
    "completeness" -> 0.20, "accuracy" -> 0.20, "consistency" -> 0.15,
    "uniqueness" -> 0.15, "validity" -> 0.15, "timeliness" -> 0.10)

  /** Unscored reference dimensions contribute weight × 0.5 (the
    * `dimension_scores.get(dim, 0.5)` default): reliability 0.03,
    * relevance 0.01, conformity 0.01. */
  val unscoredDefault: Double = 0.03 * 0.5 + 0.01 * 0.5 + 0.01 * 0.5

  /** Rule set over the line-grain sales fact. Order is the contract — the
    * oracle SQL is generated from the same list, so the weighted-sum fold
    * order (and hence the IEEE result) matches bit-for-bit. */
  val factRules: Seq[DimRule] = Seq(
    DimRule("order_key_present", "completeness", "critical",
      col("l_orderkey").isNotNull, "l_orderkey IS NOT NULL"),
    DimRule("country_present", "completeness", "high",
      col("country").isNotNull, "n_name IS NOT NULL"),
    DimRule("discount_in_range", "accuracy", "high",
      col("l_discount") >= 0 && col("l_discount") <= 1,
      "l_discount >= 0 AND l_discount <= 1"),
    DimRule("tax_in_range", "accuracy", "medium",
      col("l_tax") >= 0 && col("l_tax") < 0.5, "l_tax >= 0 AND l_tax < 0.5"),
    DimRule("ship_after_order", "consistency", "high",
      to_date(col("l_shipdate")) >= col("o_orderdate"),
      "CAST(l_shipdate AS DATE) >= o_orderdate"),
    DimRule("total_price_positive", "consistency", "medium",
      col("o_totalprice") > 0, "o_totalprice > 0"),
    DimRule("positive_quantity", "validity", "critical",
      col("l_quantity") > 0, "l_quantity > 0"),
    DimRule("non_negative_price", "validity", "high",
      col("l_extendedprice") >= 0, "l_extendedprice >= 0"),
    DimRule("no_future_ship", "timeliness", "high",
      to_date(col("l_shipdate")) <= lit("2002-12-31").cast("date"),
      "CAST(l_shipdate AS DATE) <= DATE '2002-12-31'"),
    DimRule("fresh_ship", "timeliness", "medium",
      to_date(col("l_shipdate")) >= lit("1995-01-01").cast("date"),
      "CAST(l_shipdate AS DATE) >= DATE '1995-01-01'"))

  /** The uniqueness dimension's one rule: (l_orderkey, l_linenumber) is the
    * line key — fail count = rows − distinct keys (severity high). */
  val uniquenessSeverity = "high"

  private def band(score: Column): Column =
    when(score >= 0.95, "EXCELLENT").when(score >= 0.85, "GOOD")
      .when(score >= 0.70, "ACCEPTABLE").when(score >= 0.50, "POOR")
      .otherwise("CRITICAL")

  /** (dimension, n_rules, impact, score, weight, quality_level) per scored
    * dimension, plus one `overall` row. */
  def scorecard(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.salesFact(spark, dir)
    val agg = f.agg(
      countAll.as("n"),
      factRules.map(r =>
        sum(when(coalesce(r.passes, lit(false)), 0L).otherwise(1L))
          .cast("long").as(s"f_${r.name}")) :+
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("__uniq"): _*)
    val nD = col("n").cast("double")
    def failRate(name: String): Column = col(s"f_$name").cast("double") / nD
    val uniqFailRate = (col("n") - col("__uniq")).cast("double") / nD

    def dimScore(dim: String): (Column, Column, Int) = {
      val rules = factRules.filter(_.dimension == dim)
      val terms: Seq[Column] =
        rules.map(r => lit(severityWeights(r.severity)) * failRate(r.name)) ++
          (if (dim == "uniqueness") Seq(lit(severityWeights(uniquenessSeverity)) * uniqFailRate)
           else Nil)
      val nRules = terms.size
      val impact = terms.reduce(_ + _)
      val score = greatest(lit(0.0), lit(1.0) - impact / lit(nRules.toDouble))
      (impact, score, nRules)
    }

    val dims = dimensionWeights.map { case (dim, w) =>
      val (impact, score, nRules) = dimScore(dim)
      (dim, w, impact, score, nRules)
    }
    val overall = dims.map { case (_, w, _, score, _) => lit(w) * score }
      .reduce(_ + _) + lit(unscoredDefault)
    val rows = dims.map { case (dim, w, impact, score, nRules) =>
      struct(lit(dim).as("dimension"), lit(nRules).as("n_rules"),
        impact.as("impact"), score.as("score"), lit(w).as("weight"),
        band(score).as("quality_level"))
    } :+ struct(lit("overall").as("dimension"),
      lit(factRules.size + 1).as("n_rules"),
      lit(null).cast("double").as("impact"), overall.as("score"),
      lit(1.0).as("weight"), band(overall).as("quality_level"))
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** DuckDB oracle generated from the same rule list (identical fold order
    * ⇒ identical IEEE arithmetic). */
  def scorecardOracle: String = {
    val aggSel = (Seq("COUNT(*) AS n") ++ factRules.map { r =>
      s"CAST(SUM(CASE WHEN coalesce(${r.sql}, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS f_${r.name}"
    } :+ "CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS uniq").mkString(",\n    ")
    // parenthesized: w * (f / n) must divide FIRST, as the Spark side does —
    // "w * f / n" would associate as (w·f)/n and drift by an ulp
    def failRate(name: String) = s"(CAST(f_$name AS DOUBLE) / CAST(n AS DOUBLE))"
    val uniqFailRate = "(CAST(n - uniq AS DOUBLE) / CAST(n AS DOUBLE))"
    def dimTerms(dim: String): Seq[String] = {
      val rules = factRules.filter(_.dimension == dim)
      rules.map(r => s"${severityWeights(r.severity)} * ${failRate(r.name)}") ++
        (if (dim == "uniqueness") Seq(s"${severityWeights(uniquenessSeverity)} * $uniqFailRate")
         else Nil)
    }
    def bandSql(s: String) =
      s"""CASE WHEN $s >= 0.95 THEN 'EXCELLENT' WHEN $s >= 0.85 THEN 'GOOD'
         |WHEN $s >= 0.70 THEN 'ACCEPTABLE' WHEN $s >= 0.50 THEN 'POOR'
         |ELSE 'CRITICAL' END""".stripMargin.replace("\n", " ")
    val dimSelects = dimensionWeights.map { case (dim, w) =>
      val terms = dimTerms(dim)
      val impact = terms.mkString(" + ")
      val score = s"greatest(0.0, 1.0 - ($impact) / ${terms.size}.0)"
      s"""SELECT '$dim' AS dimension, ${terms.size} AS n_rules, $impact AS impact,
         |$score AS score, CAST($w AS DOUBLE) AS weight, ${bandSql(score)} AS quality_level FROM a"""
        .stripMargin.replace("\n", " ")
    }
    val overall = dimensionWeights.map { case (dim, w) =>
      val terms = dimTerms(dim)
      s"$w * greatest(0.0, 1.0 - (${terms.mkString(" + ")}) / ${terms.size}.0)"
    }.mkString(" + ") + s" + $unscoredDefault"
    val overallSelect =
      s"""SELECT 'overall' AS dimension, ${factRules.size + 1} AS n_rules,
         |CAST(NULL AS DOUBLE) AS impact, $overall AS score, CAST(1.0 AS DOUBLE) AS weight,
         |${bandSql(s"($overall)")} AS quality_level FROM a""".stripMargin.replace("\n", " ")
    s"""WITH a AS (
       |  SELECT $aggSel
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |)
       |${(dimSelects :+ overallSelect).mkString("\nUNION ALL\n")}""".stripMargin
  }
}
