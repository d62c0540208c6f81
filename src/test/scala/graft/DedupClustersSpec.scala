package graft

import graft.dedup.DedupClusters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("connected components group transitive near-dups under the min keeper") {
    val out = DedupClusters.clusters(spark, TestSpark.sfDir, threshold = 0.85)
    val n = Tables.documents(spark, TestSpark.sfDir).count()
    assert(out.count() == n) // every doc labeled, singletons included
    // keepers are exactly the cluster ids
    val keepers = out.filter(col("is_keeper")).select("cluster_id").distinct().count()
    val clusters = out.select("cluster_id").distinct().count()
    assert(keepers == clusters)
    // every cluster id is the min doc_id of its members
    val bad = out.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(bad == 0)
    // the planted near-dup pairs collapse: clusters < docs
    assert(clusters < n)
    spark.catalog.clearCache()
  }
}
