package graft

import graft.ml.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("kmeans assigns every customer to one of k clusters, deterministically") {
    val a = Clustering.customerClusters(spark, dir, k = 4)
    val nCustomers = Tables.orders(spark, dir).select("o_custkey").distinct().count()
    assert(a.count() == nCustomers)
    val clusters = a.select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(clusters.subsetOf((0L until 4L).toSet) && clusters.size >= 2)
    // same seed, same data -> same assignment
    val b = Clustering.customerClusters(spark, dir, k = 4)
    assert(a.select("customer_id", "cluster").except(b.select("customer_id", "cluster")).count() == 0)
  }

  test("clusters separate the feature space (not one giant blob)") {
    val sizes = Clustering.customerClusters(spark, dir, k = 4)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    val total = sizes.sum.toDouble
    assert(sizes.max / total < 0.95)
  }
}
