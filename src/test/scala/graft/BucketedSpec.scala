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
}
