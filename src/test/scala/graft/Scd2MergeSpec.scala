package graft

import graft.operators.Scd2
import org.scalatest.funsuite.AnyFunSuite

/** Incremental SCD2 merge-apply: one batch exercising every case —
  * insert / tracked-update / delete / unchanged / untracked-drift /
  * history-passthrough (reference scd2.py:68-252 semantics). */
class Scd2MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def dim = {
    import spark.implicits._
    Seq(
      // key, seg, score, eff, end, is_current
      (1L, "A", 10.0, d("1995-01-01"), d("9999-12-31"), true),  // unchanged
      (2L, "B", 20.0, d("1995-01-01"), d("9999-12-31"), true),  // tracked update
      (3L, "C", 30.0, d("1995-01-01"), d("9999-12-31"), true),  // delete
      (4L, "D", 40.0, d("1995-01-01"), d("9999-12-31"), true),  // untracked drift only
      (2L, "OLD", 19.0, d("1992-01-01"), d("1995-01-01"), false) // history row
    ).toDF("k", "seg", "score", "effective_date", "end_date", "is_current")
  }

  private def incoming = {
    import spark.implicits._
    Seq(
      (1L, "A", 10.0),   // unchanged
      (2L, "B2", 20.0),  // tracked change
      (4L, "D", 41.0),   // only untracked `score` drifts → stays unchanged
      (5L, "E", 50.0)    // brand new key
    ).toDF("k", "seg", "score")
  }

  test("merge emits close/open/insert/delete/unchanged/history correctly") {
    val out = Scd2.merge(dim, incoming, Seq("k"), Seq("seg"), "1998-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDate(3).toString, r.getDate(4).toString, r.getBoolean(5), r.getString(6)))
      .toSet
    assert(out == Set(
      (1L, "A", 10.0, "1995-01-01", "9999-12-31", true, "unchanged"),
      (2L, "B", 20.0, "1995-01-01", "1998-01-01", false, "closed"),
      (2L, "B2", 20.0, "1998-01-01", "9999-12-31", true, "new_version"),
      (3L, "C", 30.0, "1995-01-01", "1998-01-01", false, "delete"),
      // untracked drift keeps the EXISTING row (scd2.py:187-199)
      (4L, "D", 40.0, "1995-01-01", "9999-12-31", true, "unchanged"),
      (5L, "E", 50.0, "1998-01-01", "9999-12-31", true, "insert"),
      (2L, "OLD", 19.0, "1992-01-01", "1995-01-01", false, "history")))
  }

  test("exactly one current row per live key after merge") {
    val out = Scd2.merge(dim, incoming, Seq("k"), Seq("seg"), "1998-01-01")
    val perKey = out.filter("is_current").groupBy("k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perKey == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("driver query scd2_merge is non-empty and consistent at sf0.001") {
    val out = Scd2.scd2Merge(spark, TestSpark.sfDir)
    val byType = out.groupBy("change_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byType.keySet == Set("unchanged", "closed", "new_version", "insert", "delete", "history"))
    assert(byType("closed") == byType("new_version"))
  }
}
