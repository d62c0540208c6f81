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

  /** Collects AsOfJoinExec nodes, descending through the AQE wrappers
    * (AdaptiveSparkPlanExec / QueryStageExec are leaf nodes that hide their
    * subtree from a plain `collect`). */
  private def findAsOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[AsOfJoinExec] =
    p.collect {
      case e: AsOfJoinExec => Seq(e)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findAsOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findAsOf(q.plan)
    }.flatten

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
    df.collect() // finalize any adaptive re-planning before inspecting
    assert(findAsOf(df.queryExecution.executedPlan).nonEmpty)
  }

  test("AQE-enabled session plans AsOfJoinExec and matches the composed operator") {
    // GraftSession (the recommended production entry) enables AQE; the exec's
    // zipPartitions requires equal child partition counts, so pin that AQE's
    // runtime re-planning (coalesced shuffle reads) keeps the operator whole
    val aqe = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    import aqe.implicits._
    val left = (1 to 500).map(i => ((i % 7).toLong, ts(f"2024-01-${i % 27 + 1}%02d 12:00:00"), i))
      .toDF("k", "t", "n")
    val right = (1 to 300).map(i => ((i % 5).toLong, ts(f"2024-01-${i % 27 + 1}%02d 00:00:00"), i * 1.5))
      .toDF("k", "rt", "price")
    val df = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
    val native = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    // after execution the adaptive plan is final: unwrap and find the node
    assert(findAsOf(df.queryExecution.executedPlan).nonEmpty,
      s"AsOfJoinExec missing from AQE final plan:\n${df.queryExecution.executedPlan}")
    val composed = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) =>
      assert(n._1 == c._1 && n._2 == c._2 && n._3 == c._3 &&
        (n._4 == c._4 || (n._4.isNaN && c._4.isNaN)))
    }
  }

  test("string keys survive across spill-prone buffers (defensive key copy)") {
    import spark.implicits._
    // many string keys, interleaved times: exercises the carried-key guard
    val left = (1 to 2000).map { i =>
      (s"key_${i % 97}", ts(f"2024-01-${i % 27 + 1}%02d 12:00:00"), i)
    }.toDF("k", "t", "n")
    val right = (1 to 1500).map { i =>
      (s"key_${i % 101}", ts(f"2024-01-${i % 27 + 1}%02d 00:00:00"), i * 1.0)
    }.toDF("k", "rt", "price")
    val native = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    val composed = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) =>
      assert(n._1 == c._1 && n._2 == c._2 && n._3 == c._3 &&
        (n._4 == c._4 || (n._4.isNaN && c._4.isNaN)), s"mismatch: $n vs $c")
    }
  }

  test("column pruning pushes a narrow projection through the native as-of node") {
    import org.apache.spark.sql.functions.col
    val e = Tables.events(spark, dir) // 6 columns incl. the wide `props` json
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("__rt"))
    val narrow = NativeAsOf.asofJoin(e, o, "user_id", "o_custkey", "ts", "__rt",
      Seq("o_orderkey")).select("event_id", "matched_o_orderkey")
    val asOfNode = org.apache.spark.sql.GraftInternal.analyzedToOptimized(narrow).collectFirst {
      case a: graft.plans.AsOfJoinPlan => a
    }
    assert(asOfNode.isDefined)
    val leftCols = asOfNode.get.left.output.map(_.name).toSet
    assert(!leftCols.contains("props") && !leftCols.contains("value"),
      s"unused wide columns not pruned from the as-of left side: $leftCols")
    assert(leftCols.contains("user_id") && leftCols.contains("ts"))
  }

  test("compact decimal keys take the primitive path and match the composed operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // decimal(12,2) key on both sides → unscaled-long comparisons
    val left = (1 to 400).map(i => ((i % 11) + 0.25, ts(f"2024-01-${i % 27 + 1}%02d 12:00:00"), i))
      .toDF("kd", "t", "n").withColumn("k", col("kd").cast("decimal(12,2)")).drop("kd")
    val right = (1 to 300).map(i => ((i % 13) + 0.25, ts(f"2024-01-${i % 27 + 1}%02d 00:00:00"), i * 2.0))
      .toDF("kd", "rt", "price").withColumn("k", col("kd").cast("decimal(12,2)")).drop("kd")
    val native = NativeAsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => (r.getDecimal(r.fieldIndex("k")).toString, r.getTimestamp(0), r.getInt(1),
        if (r.isNullAt(r.fieldIndex("matched_price"))) Double.NaN else r.getAs[Double]("matched_price")))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    val composed = AsOf.asofJoin(left, right, "k", "k", "t", "rt", Seq("price"))
      .collect().map(r => (r.getDecimal(r.fieldIndex("k")).toString, r.getTimestamp(0), r.getInt(1),
        if (r.isNullAt(r.fieldIndex("matched_price"))) Double.NaN else r.getAs[Double]("matched_price")))
      .sortBy(t => (t._1, t._2.getTime, t._3))
    assert(native.length == composed.length && native.length == 400)
    native.zip(composed).foreach { case (n, c) =>
      assert(n._1 == c._1 && n._2 == c._2 && n._3 == c._3 &&
        (n._4 == c._4 || (n._4.isNaN && c._4.isNaN)), s"mismatch: $n vs $c")
    }
  }
}
