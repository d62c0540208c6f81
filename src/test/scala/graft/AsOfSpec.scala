package graft

import graft.operators.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the round-2 review findings on asofJoin: string
  * keys must not collapse (the old long-cast bug) and matched_* columns
  * must all come from one right row even when payload fields are null. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join works with string keys") {
    import spark.implicits._
    val left = Seq(
      ("alice", ts("2024-01-02 00:00:00"), 1L),
      ("bob", ts("2024-01-02 00:00:00"), 2L)
    ).toDF("k", "t", "event_id")
    val right = Seq(
      ("alice", ts("2024-01-01 00:00:00"), 10.0),
      ("bob", ts("2024-01-01 12:00:00"), 20.0),
      ("carol", ts("2024-01-01 00:00:00"), 99.0)
    ).toDF("k", "rt", "price")
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("matched_price")).toMap
    assert(out == Map(1L -> 10.0, 2L -> 20.0)) // no cross-key bleed
  }

  test("null payload fields do not stitch values from different right rows") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-03 00:00:00"), "e1")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), Option(5.0), Option.empty[Long]),
      (1L, ts("2024-01-02 00:00:00"), Option.empty[Double], Option(7L))
    ).toDF("k", "rt", "price", "qty")
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price", "qty")).head
    // the most recent right row is (null, 7) — price must be null, not 5.0
    assert(out.isNullAt(out.fieldIndex("matched_price")))
    assert(out.getAs[Long]("matched_qty") == 7L)
  }

  test("left rows with no prior right row get null matches") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "early")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-06-01 00:00:00"), 3.0)).toDF("k", "rt", "price")
    val out = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price")).head
    assert(out.isNullAt(out.fieldIndex("matched_price")))
  }

  test("right rows with NULL time or NULL key never match (ADVICE r2)") {
    import spark.implicits._
    // nulls-first ordering used to carry the null-time payload onto left
    // rows that have no real prior right row — DuckDB ASOF never matches it
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "no-prior"),
      (2L, ts("2024-01-02 00:00:00"), "has-prior")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), Option.empty[java.sql.Timestamp], 666.0), // null time: must never match
      (Option.empty[Long], Option(ts("2023-01-01 00:00:00")), 777.0), // null key: must never match
      (Option(2L), Option(ts("2024-01-01 00:00:00")), 42.0)
    ).toDF("k", "rt", "price")
    val rows = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => r.getAs[String]("tag") ->
        (if (r.isNullAt(r.fieldIndex("matched_price"))) None else Some(r.getDouble(r.fieldIndex("matched_price"))))).toMap
    assert(rows("no-prior").isEmpty)
    assert(rows("has-prior").contains(42.0))
  }
}
