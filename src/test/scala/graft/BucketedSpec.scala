package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joining two same-bucketed tables needs no shuffle exchange") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
    val cust = Tables.customer(spark, TestSpark.sfDir)
    Bucketed.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Bucketed.writeBucketed(cust.withColumnRenamed("c_custkey", "o_custkey"), "b_cust", "o_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = Bucketed.bucketJoin(spark, "b_orders", "b_cust", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == orders.count()) // every order has its customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("fact_join_bucketed matches fact_join_shuffled and plans no Exchange under the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = Bucketed.factJoinBucketed(spark, TestSpark.sfDir, buckets = 4)
      val shuffled = Bucketed.factJoinShuffled(spark, TestSpark.sfDir)
      bucketed.collect() // finalize adaptive re-planning before inspecting
      // descend through AQE wrappers (AdaptiveSparkPlanExec / QueryStageExec
      // are leaves that hide their subtree from a plain collect)
      def findSmj(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.joins.SortMergeJoinExec] = p.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq(j)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findSmj(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findSmj(q.plan)
      }.flatten
      // the only Exchange allowed is the 5-row rollup's own aggregation
      // shuffle; the join itself must read bucket-aligned
      val joinPlan = findSmj(bucketed.queryExecution.executedPlan).headOption
      assert(joinPlan.isDefined, "expected a sort-merge join over bucketed scans")
      assert(!joinPlan.get.toString.contains("Exchange"),
        s"bucketed join still shuffles:\n${joinPlan.get}")
      val b = bucketed.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val s = shuffled.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(b.sameElements(s))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
