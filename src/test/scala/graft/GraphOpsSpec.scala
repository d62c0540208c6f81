package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("rank mass is conserved up to floor-division leakage") {
    val out = GraphOps.pageRank(spark, dir).persist()
    val total = out.agg(sum("rank")).head.getLong(0)
    // every floor division leaks < 1 unit; per iteration that is < |E| + N
    // units out of 10^12 — after 10 rounds total mass stays within 0.1%
    assert(total <= GraphOps.RankBase)
    assert(total >= (GraphOps.RankBase * 999L) / 1000L,
      s"rank mass $total leaked more than 0.1% of ${GraphOps.RankBase}")
    out.unpersist()
  }

  test("node encoding partitions cleanly into customers and parts") {
    val out = GraphOps.pageRank(spark, dir).persist()
    val types = out.select("node_type").distinct().collect().map(_.getString(0)).sorted
    assert(types.sameElements(Array("customer", "part")))
    // node keys are genuine customer / part keys
    val custKeys = Tables.customer(spark, dir).select(col("c_custkey").as("node_key"))
    val badC = out.filter(col("node_type") === "customer")
      .join(custKeys, Seq("node_key"), "left_anti").count()
    assert(badC == 0, s"$badC customer nodes with unknown keys")
    out.unpersist()
  }

  test("high-degree nodes accumulate more rank (degree-rank correlation)") {
    val out = GraphOps.pageRank(spark, dir).persist()
    // compare mean rank of the top-degree decile vs the bottom decile
    val q = out.stat.approxQuantile("out_degree", Array(0.1, 0.9), 0.0)
    val lo = out.filter(col("out_degree") <= q(0)).agg(avg("rank")).head.getDouble(0)
    val hi = out.filter(col("out_degree") >= q(1)).agg(avg("rank")).head.getDouble(0)
    assert(hi > lo, f"top-decile mean rank $hi%.0f not above bottom-decile $lo%.0f")
    out.unpersist()
  }

  test("incremental warm-start beats a cold start at the same round budget") {
    val full = GraphOps.pageRank(spark, dir, ordered = false)
      .select(col("node_type"), col("node_key"), col("rank").as("rf"))
    def dist(df: org.apache.spark.sql.DataFrame) =
      df.join(full, Seq("node_type", "node_key"))
        .agg(sum(abs(col("rank") - col("rf")))).head.getLong(0)
    val warm = dist(GraphOps.pageRankIncremental(spark, dir, ordered = false))
    val cold = dist(GraphOps.pageRank(spark, dir,
      iters = GraphOps.DeltaIters, ordered = false))
    info(s"L1 distance to the 10-round fixpoint: warm=$warm cold=$cold")
    assert(warm < cold,
      s"warm-start ($warm) should land closer than a cold start ($cold)")
  }

  test("incremental output covers the union graph exactly once per node") {
    val out = GraphOps.pageRankIncremental(spark, dir).persist()
    val fullNodes = GraphOps.pageRank(spark, dir, ordered = false).count()
    assert(out.count() == fullNodes)
    assert(out.select("node_type", "node_key").distinct().count() == fullNodes)
    out.unpersist()
  }

  test("power iteration contracts: adjacent-iteration deltas decay") {
    // the bipartite graph oscillates with period 2 (every edge crosses
    // sides), damped at 0.85 per round — so adjacent-iteration deltas
    // don't vanish at iters=10, but they MUST shrink geometrically
    def at(i: Int) = GraphOps.pageRank(spark, dir, iters = i, ordered = false)
      .select(col("node_type"), col("node_key"), col("rank").as(s"r$i"))
    val d1 = at(10).join(at(11), Seq("node_type", "node_key"))
      .agg(max(abs(col("r10") - col("r11")))).head.getLong(0)
    val d2 = at(12).join(at(13), Seq("node_type", "node_key"))
      .agg(max(abs(col("r12") - col("r13")))).head.getLong(0)
    info(s"max adjacent delta: iters 10→11 = $d1, 12→13 = $d2")
    // two more rounds damp the oscillation by 0.85² ≈ 0.72
    assert(d2 < d1, s"deltas did not decay: $d1 -> $d2")
  }
}
