package graft.operators

import graft.Tables
import graft.Exact.countAll
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic validation-rule engine (reference:
  * src/etl/transformations/data_cleaning.py:15-53,141-170): named rules with
  * severities, evaluated as row-level flags and as a per-rule pass/fail
  * report.
  *
  * The reference applies each rule as a Python lambda per VALUE per column
  * (data_cleaning.py:150-152 — `data[col].apply(rule.validate)`, one pandas
  * pass per rule×column). Here a rule is a named Catalyst `Column` predicate:
  * row flags are one codegen'd projection, and the report is ONE aggregate
  * pass computing every rule's violation count simultaneously — no per-rule
  * jobs, no driver loop, shuffle-free (a global single-row aggregate).
  * A NULL predicate counts as a violation, mirroring the reference's
  * exception→False contract (data_cleaning.py:28-33).
  */
object Validation {

  /** A named validation rule; `passes` is any boolean Column expression. */
  final case class Rule(name: String, passes: Column, severity: String = "error")

  /** Row-level flags: one boolean column per rule (`vr_<name>`), plus
    * `failed_rules` (names of violated rules, stable rule order) and
    * `is_valid` (no error-severity violations). */
  def withRuleFlags(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val flagged = rules.foldLeft(df) { (d, r) =>
      d.withColumn(s"vr_${r.name}", coalesce(r.passes, lit(false)))
    }
    val failed = array_compact(array(rules.map(r =>
      when(!col(s"vr_${r.name}"), lit(r.name))): _*))
    val errors = rules.filter(_.severity == "error")
    val valid = if (errors.isEmpty) lit(true)
      else errors.map(r => col(s"vr_${r.name}")).reduce(_ && _)
    flagged.withColumn("failed_rules", failed).withColumn("is_valid", valid)
  }

  /** Rows passing every error-severity rule, as a plain conjunction of the
    * raw predicates — null-rejecting semantics are identical (a NULL
    * predicate drops the row) and Catalyst can still push the conjuncts
    * into the scan, which a coalesce() wrapper would block. */
  def filterValid(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errors = rules.filter(_.severity == "error")
    if (errors.isEmpty) df else df.filter(errors.map(_.passes).reduce(_ && _))
  }

  /** Per-rule report in ONE aggregate pass:
    * (rule_name, severity, n_rows, n_fail, fail_rate). */
  def ruleReport(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val agg = df.agg(
      countAll.as("n_rows"),
      rules.map(r => sum(when(coalesce(r.passes, lit(false)), 0L).otherwise(1L))
        .cast("long").as(s"f_${r.name}")): _*)
    val rows = rules.map(r => struct(
      lit(r.name).as("rule_name"), lit(r.severity).as("severity"),
      col("n_rows").as("n_rows"), col(s"f_${r.name}").as("n_fail"),
      (col(s"f_${r.name}").cast("double") / col("n_rows").cast("double")).as("fail_rate")))
    agg.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Driver-query rule set over raw lineitem: (rule, equivalent DuckDB
    * predicate) pairs — the oracle SQL is generated from the same list. */
  val lineitemRules: Seq[(Rule, String)] = Seq(
    (Rule("positive_quantity", col("l_quantity") > 0), "l_quantity > 0"),
    (Rule("non_negative_price", col("l_extendedprice") >= 0), "l_extendedprice >= 0"),
    (Rule("order_key_present", col("l_orderkey").isNotNull), "l_orderkey IS NOT NULL"),
    (Rule("discount_in_range", col("l_discount") >= 0 && col("l_discount") <= 1,
      severity = "warning"), "l_discount >= 0 AND l_discount <= 1"),
    (Rule("tax_sane", col("l_tax") >= 0 && col("l_tax") < 0.5,
      severity = "warning"), "l_tax >= 0 AND l_tax < 0.5"),
    (Rule("ship_date_present", col("l_shipdate").isNotNull,
      severity = "info"), "l_shipdate IS NOT NULL"))

  def validationReport(spark: SparkSession, dir: String): DataFrame =
    ruleReport(Tables.lineitem(spark, dir), lineitemRules.map(_._1))

  /** Validation test-case synthesis (reference: smart_validator.py:458
    * `generate_test_cases` — NOTE the reference's four `_generate_*_rules`
    * helpers are called but never defined; the enclosing try/except
    * swallows the AttributeError and returns [], so its synthesis is
    * effectively the baseline profile at :1180 plus intent). This is the
    * working version of that intent, Spark-first: ONE aggregate pass
    * profiles every candidate column (count, nulls, distinct estimate via
    * exact countDistinct, min/max, mean±3σ for numerics) and deterministic
    * ladders emit [[Rule]]s:
    *
    *  - `<c>_not_null` when the observed null rate is ≤ `nullSlack` (a
    *    column that is already ~always present should stay present);
    *  - `<c>_in_range` for numerics: observed [min, max] widened by one
    *    3σ margin — new data may drift, a 10× excursion is a bug;
    *  - `<c>_in_set` for low-cardinality strings (≤ `maxCategories`
    *    distinct): membership in the observed category set.
    *
    * Suggested rules are warnings (a human promotes them to errors), and
    * the generation itself is an operator a user runs against a silver
    * table to bootstrap a rule config — exactly the reference's use case,
    * minus the undefined helpers. */
  def suggestRules(df: DataFrame, numericCols: Seq[String],
                   stringCols: Seq[String], nullSlack: Double = 0.01,
                   maxCategories: Int = 50): Seq[Rule] = {
    require(numericCols.intersect(stringCols).isEmpty,
      s"suggestRules: a column may be profiled as numeric or string, not both: " +
        numericCols.intersect(stringCols).mkString(", "))
    val aggs =
      numericCols.flatMap { c =>
        Seq(count(lit(1)).as(s"n_$c"), count(col(c)).as(s"nn_$c"),
          min(col(c)).cast("double").as(s"min_$c"),
          max(col(c)).cast("double").as(s"max_$c"),
          stddev_samp(col(c).cast("double")).as(s"sd_$c"))
      } ++ stringCols.flatMap { c =>
        Seq(count(lit(1)).as(s"n_$c"), count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"d_$c"))
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    def d(name: String) = r.getAs[Double](name)
    def l(name: String) = r.getAs[Long](name)
    val numeric = numericCols.flatMap { c =>
      val (n, nn) = (l(s"n_$c"), l(s"nn_$c"))
      if (nn == 0) Seq.empty
      else {
        val nullRate = (n - nn).toDouble / n.toDouble
        val margin = if (r.isNullAt(r.fieldIndex(s"sd_$c"))) 0.0 else 3.0 * d(s"sd_$c")
        val (lo, hi) = (d(s"min_$c") - margin, d(s"max_$c") + margin)
        val notNull = if (nullRate <= nullSlack)
          Seq(Rule(s"${c}_not_null", col(c).isNotNull, "warning")) else Seq.empty
        notNull :+ Rule(s"${c}_in_range",
          col(c).cast("double") >= lo && col(c).cast("double") <= hi, "warning")
      }
    }
    val categorical = stringCols.flatMap { c =>
      val (n, nn, dis) = (l(s"n_$c"), l(s"nn_$c"), l(s"d_$c"))
      if (nn == 0 || dis > maxCategories) Seq.empty
      else {
        val cats = df.select(col(c)).where(col(c).isNotNull).distinct()
          .collect().map(_.getString(0)).sorted.toSeq // ≤ maxCategories rows
        val nullRate = (n - nn).toDouble / n.toDouble
        val notNull = if (nullRate <= nullSlack)
          Seq(Rule(s"${c}_not_null", col(c).isNotNull, "warning")) else Seq.empty
        notNull :+ Rule(s"${c}_in_set", col(c).isin(cats: _*), "warning")
      }
    }
    numeric ++ categorical
  }

  /** Candidate columns for the suggested_rules driver query: every lineitem
    * measure (cents-exact) plus the two flag strings. Generated oracle SQL
    * shares these lists so the two engines can never drift. */
  private val suggestNumeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val suggestString = Seq("l_returnflag", "l_linestatus")

  /** Driver-query surface for [[suggestRules]]'s intent as a hash-checkable
    * TABLE: one row per suggested rule — (rule_name, column_name, kind,
    * lo, hi, members, severity), deterministically ordered by rule_name.
    *
    * Where [[suggestRules]] profiles with `stddev_samp` (a distributed
    * double moment whose merge order is engine/partition-dependent), this
    * emits the ±3σ range bounds from EXACT integer-cents moments (the
    * corrMatrix recipe: cents as long, decimal(38,0) Σx², hi/lo-split
    * conversion, one pinned IEEE closing expression) so the DuckDB oracle
    * matches bit-for-bit at any scale. ONE aggregate pass computes every
    * profile ingredient (counts, min/max, Σx, Σx², distinct counts and the
    * ≤`maxCategories` category sets via sort_array(collect_set)); the rule
    * rows explode from that single row — no second scan, no driver collect.
    */
  def suggestedRules(spark: SparkSession, dir: String, nullSlack: Double = 0.01,
                     maxCategories: Int = 50): DataFrame = {
    val df = Tables.lineitem(spark, dir)
    def cents(c: String): Column = round(col(c) * 100, 0).cast("long")
    def dec(c: Column): Column = c.cast("decimal(19,0)")
    val aggs =
      suggestNumeric.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"),
          min(cents(c)).as(s"mn_$c"), max(cents(c)).as(s"mx_$c"),
          sum(cents(c)).as(s"s_$c"),
          sum(dec(cents(c)) * dec(cents(c))).as(s"s2_$c"))
      } ++ suggestString.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"d_$c"),
          array_join(sort_array(collect_set(col(c))), ",").as(s"set_$c"))
      }
    val prof = df.agg(countAll.as("n"), aggs: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def ruleRow(name: String, column: String, kind: String,
                lo: Column, hi: Column, members: Column) = struct(
      lit(name).as("rule_name"), lit(column).as("column_name"),
      lit(kind).as("kind"), lo.as("lo"), hi.as("hi"),
      members.as("members"), lit("warning").as("severity"))
    def notNullRow(c: String) = {
      val nullRate = (col("n") - col(s"nn_$c")).cast("double") / col("n").cast("double")
      when(col(s"nn_$c") > 0 && nullRate <= nullSlack,
        ruleRow(s"${c}_not_null", c, "not_null", nullD, nullD, nullS))
    }
    val rows =
      suggestNumeric.flatMap { c =>
        val nnD = col(s"nn_$c").cast("double")
        // sample stddev in cents from the exact moments; the greatest(,0)
        // absorbs the ~1-ulp negative the double subtraction can produce
        // for a constant column (both engines run the identical guard)
        val sdCents = sqrt(
          greatest(nnD * graft.Exact.bigDecToDouble(col(s"s2_$c").cast("decimal(38,0)"))
            - col(s"s_$c").cast("double") * col(s"s_$c").cast("double"), lit(0.0))
            / (nnD * (nnD - lit(1.0))))
        val margin = when(col(s"nn_$c") >= 2, sdCents / lit(100.0) * lit(3.0)).otherwise(lit(0.0))
        Seq(notNullRow(c),
          when(col(s"nn_$c") > 0,
            ruleRow(s"${c}_in_range", c, "range",
              col(s"mn_$c").cast("double") / lit(100.0) - margin,
              col(s"mx_$c").cast("double") / lit(100.0) + margin, nullS)))
      } ++ suggestString.flatMap { c =>
        Seq(notNullRow(c),
          when(col(s"nn_$c") > 0 && col(s"d_$c") <= maxCategories,
            ruleRow(s"${c}_in_set", c, "set", nullD, nullD, col(s"set_$c"))))
      }
    prof.select(explode(array_compact(array(rows: _*))).as("r"))
      .select(col("r.*"))
      .orderBy("rule_name")
  }

  /** DuckDB oracle mirroring suggestedRules: same one-pass profile CTE,
    * each rule a conditional SELECT branch (WHERE replaces array_compact),
    * identical pinned IEEE arithmetic. */
  def suggestedRulesOracle(nullSlack: Double = 0.01, maxCategories: Int = 50): String = {
    import graft.Exact.bigDecToDoubleSql
    val aggSel = (Seq("COUNT(*) AS n") ++
      suggestNumeric.flatMap { c => Seq(
        s"COUNT($c) AS nn_$c",
        s"CAST(MIN(CAST(round($c * 100) AS BIGINT)) AS BIGINT) AS mn_$c",
        s"CAST(MAX(CAST(round($c * 100) AS BIGINT)) AS BIGINT) AS mx_$c",
        s"CAST(SUM(CAST(round($c * 100) AS BIGINT)) AS BIGINT) AS s_$c",
        s"SUM(CAST(CAST(round($c * 100) AS BIGINT) AS DECIMAL(19,0)) * " +
          s"CAST(CAST(round($c * 100) AS BIGINT) AS DECIMAL(19,0))) AS s2_$c")
      } ++ suggestString.flatMap { c => Seq(
        s"COUNT($c) AS nn_$c", s"COUNT(DISTINCT $c) AS d_$c",
        s"array_to_string(list_sort(list(DISTINCT $c)), ',') AS set_$c")
      }).mkString(",\n    ")
    def notNullSql(c: String) =
      s"""SELECT '${c}_not_null' AS rule_name, '$c' AS column_name,
         |  'not_null' AS kind, CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi,
         |  CAST(NULL AS VARCHAR) AS members, 'warning' AS severity
         |FROM a WHERE nn_$c > 0 AND CAST(n - nn_$c AS DOUBLE) / CAST(n AS DOUBLE) <= $nullSlack""".stripMargin
    val branches = (
      suggestNumeric.flatMap { c =>
        val sd = s"sqrt(greatest(CAST(nn_$c AS DOUBLE) * ${bigDecToDoubleSql(s"s2_$c")}" +
          s" - CAST(s_$c AS DOUBLE) * CAST(s_$c AS DOUBLE), 0.0)" +
          s" / (CAST(nn_$c AS DOUBLE) * (CAST(nn_$c AS DOUBLE) - 1.0)))"
        val margin = s"CASE WHEN nn_$c >= 2 THEN $sd / 100.0 * 3.0 ELSE 0.0 END"
        Seq(notNullSql(c),
          s"""SELECT '${c}_in_range', '$c', 'range',
             |  CAST(mn_$c AS DOUBLE) / 100.0 - $margin,
             |  CAST(mx_$c AS DOUBLE) / 100.0 + $margin,
             |  CAST(NULL AS VARCHAR), 'warning'
             |FROM a WHERE nn_$c > 0""".stripMargin)
      } ++ suggestString.flatMap { c =>
        Seq(notNullSql(c),
          s"""SELECT '${c}_in_set', '$c', 'set', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
             |  set_$c, 'warning'
             |FROM a WHERE nn_$c > 0 AND d_$c <= $maxCategories""".stripMargin)
      }).mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT
       |    $aggSel
       |  FROM lineitem)
       |$branches
       |ORDER BY rule_name""".stripMargin
  }

  /** DuckDB oracle mirroring validationReport, generated from lineitemRules. */
  def validationReportOracle: String = {
    val aggSel = (Seq("COUNT(*) AS n_rows") ++ lineitemRules.map { case (r, sql) =>
      s"CAST(SUM(CASE WHEN coalesce($sql, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS f_${r.name}"
    }).mkString(", ")
    val branches = lineitemRules.map { case (r, _) =>
      s"SELECT '${r.name}' AS rule_name, '${r.severity}' AS severity, n_rows, " +
        s"f_${r.name} AS n_fail, CAST(f_${r.name} AS DOUBLE) / CAST(n_rows AS DOUBLE) AS fail_rate FROM a"
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT $aggSel FROM lineitem)
       |$branches""".stripMargin
  }
}
