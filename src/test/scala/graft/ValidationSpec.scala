package graft

import graft.operators.{Silver, Validation}
import graft.operators.Validation.Rule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic validation-rule engine (reference data_cleaning.py:15-53,141-170):
  * row flags, null-as-violation, severity handling, one-pass report, and the
  * Silver refactor keeping its scan pushdown. */
class ValidationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (3L, null), (null, 20.0)
    ).toDF("k", "v")
  }

  private val rules = Seq(
    Rule("k_present", col("k").isNotNull),
    Rule("v_positive", col("v") > 0),
    Rule("v_small", col("v") < 100, severity = "warning"))

  test("withRuleFlags: per-rule booleans, failed_rules, is_valid; NULL counts as violation") {
    val out = Validation.withRuleFlags(df, rules).collect()
      .map(r => (Option(r.getAs[java.lang.Long]("k")).map(_.toLong),
        r.getAs[Seq[String]]("failed_rules").toList, r.getAs[Boolean]("is_valid"))).toSet
    assert(out == Set(
      (Some(1L), Nil, true),
      (Some(2L), List("v_positive"), false),
      (Some(3L), List("v_positive", "v_small"), false), // NULL v fails both v-rules
      (None, List("k_present"), false)))
  }

  test("ruleReport: one row per rule with exact violation counts") {
    val rep = Validation.ruleReport(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rep == Set(
      ("k_present", "error", 4L, 1L),
      ("v_positive", "error", 4L, 2L),
      ("v_small", "warning", 4L, 1L))) // only the NULL v violates v_small
  }

  test("filterValid drops error violations but ignores warning-severity rules") {
    val kept = Validation.filterValid(df, rules).collect().map(_.getAs[Any]("k")).toSet
    assert(kept == Set(1L)) // row 2 fails v_positive, 3 null v, 4 null k
  }

  test("Silver business rules still reach the parquet scan as pushed filters") {
    val plan = Silver.cleanLineitem(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan(l_quantity,0.0)"))
  }

  test("suggestRules: profile-derived rules pass on clean data, catch planted violations") {
    import spark.implicits._
    val clean = Seq(
      (1L, 10.0, "A"), (2L, 12.5, "B"), (3L, 11.0, "A"),
      (4L, 9.5, "C"), (5L, 10.5, "B"), (6L, 11.5, "A")
    ).toDF("id", "amount", "cat")
    val rules = graft.operators.Validation.suggestRules(
      clean, numericCols = Seq("amount"), stringCols = Seq("cat"))
    assert(rules.map(_.name).toSet ===
      Set("amount_not_null", "amount_in_range", "cat_not_null", "cat_in_set"))
    assert(rules.forall(_.severity == "warning"))
    // clean data passes every suggested rule
    val cleanReport = graft.operators.Validation.ruleReport(clean, rules)
      .collect().map(r => r.getAs[String]("rule_name") -> r.getAs[Long]("n_fail")).toMap
    assert(cleanReport.values.forall(_ == 0L), s"clean data flagged: $cleanReport")
    // planted violations: out-of-range amount, unseen category, nulls
    val dirty = clean.unionByName(Seq(
      (7L, 1e9, "A"),                       // amount far past max+3σ
      (8L, 10.0, "ZZZ")                     // category never observed
    ).toDF("id", "amount", "cat"))
      .unionByName(Seq((9L, Option.empty[Double], Option.empty[String]))
        .toDF("id", "amount", "cat"))
    val dirtyReport = graft.operators.Validation.ruleReport(dirty, rules)
      .collect().map(r => r.getAs[String]("rule_name") -> r.getAs[Long]("n_fail")).toMap
    assert(dirtyReport("amount_in_range") >= 1L, s"range rule missed: $dirtyReport")
    assert(dirtyReport("cat_in_set") >= 1L, s"set rule missed: $dirtyReport")
    assert(dirtyReport("amount_not_null") === 1L && dirtyReport("cat_not_null") === 1L)
  }

  test("suggestRules skips high-cardinality strings and all-null columns") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"key_$i", Option.empty[Double]))
      .toDF("id", "k", "v")
    val rules = graft.operators.Validation.suggestRules(
      df, numericCols = Seq("v"), stringCols = Seq("k"), maxCategories = 50)
    assert(rules.isEmpty, s"unexpected rules: ${rules.map(_.name)}")
  }

  test("suggestRules rejects a column profiled as both numeric and string") {
    intercept[IllegalArgumentException] {
      graft.operators.Validation.suggestRules(
        df, numericCols = Seq("v"), stringCols = Seq("v"))
    }
  }

  test("suggestedRules driver query: rule table with exact-moment range bounds") {
    val out = Validation.suggestedRules(spark, TestSpark.sfDir).collect()
    // deterministically ordered, one row per emitted rule
    assert(out.map(_.getAs[String]("rule_name")).toSeq ==
      out.map(_.getAs[String]("rule_name")).toSeq.sorted)
    val byName = out.map(r => r.getAs[String]("rule_name") -> r).toMap
    // every candidate column yields not_null (testdata has no nulls) + its kind
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")) {
      assert(byName.contains(s"${c}_not_null") && byName.contains(s"${c}_in_range"))
      val r = byName(s"${c}_in_range")
      assert(r.getAs[String]("kind") == "range")
      assert(r.getAs[Double]("lo") < r.getAs[Double]("hi"))
      assert(r.isNullAt(r.fieldIndex("members")))
    }
    for (c <- Seq("l_returnflag", "l_linestatus")) {
      val r = byName(s"${c}_in_set")
      assert(r.getAs[String]("kind") == "set")
      val members = r.getAs[String]("members").split(",").toSeq
      assert(members == members.sorted && members.nonEmpty)
    }
    // the ±3σ widening really widens: range bounds sit outside observed min/max
    val q = byName("l_quantity_in_range")
    assert(q.getAs[Double]("lo") < 1.0 && q.getAs[Double]("hi") > 50.0)
  }
}
