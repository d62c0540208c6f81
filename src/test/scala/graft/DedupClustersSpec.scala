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

  test("duplicated sub-3-token docs stay singletons on the collapsed path") {
    import spark.implicits._
    // exact copies push duplication factor over the collapse threshold;
    // the short-doc group must NOT form a cluster — on the direct path those
    // docs never shingle, so they never pair (the oracle agrees)
    val longText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (
      Seq((0L, longText), (1L, longText), (2L, longText)) ++     // long exact dups
        Seq((3L, "hi there"), (4L, "hi there"), (5L, "hi there")) ++ // short exact dups
        (6L to 15L).map(i => (i, (1 to 40).map(j => s"w${i}_$j").mkString(" ")))
      ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_short_dup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DedupClusters.clusters(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    // long dups cluster under the min id
    assert(Seq(0L, 1L, 2L).forall(id => out(id) == (0L, 3L)))
    // short dups remain singleton clusters of themselves
    assert(Seq(3L, 4L, 5L).forall(id => out(id) == (id, 1L)))
    spark.catalog.clearCache()
  }

  test("cluster keepers: quality wins the election, min-id only breaks ties") {
    import spark.implicits._
    // doc 20 = doc 10 + extra trailing tokens → near-dup (high shingle
    // overlap) with MORE tokens → higher quality score → doc 20 must be
    // the keeper even though doc 10 has the smaller id. docs 30/31 are
    // exact twins (equal quality) → tie breaks to min id 30.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val twin = (1 to 35).map(i => s"same$i").mkString(" ")
    val docs = Seq(
      (10L, base),
      (20L, base + " extra1 extra2 extra3"),
      (30L, twin), (31L, twin),
      (40L, (1 to 25).map(i => s"solo$i").mkString(" "))
    ).map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_keepers").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = DedupClusters.clusterKeepers(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("keeper_id"), r.getAs[Boolean]("is_kept"))).toMap
    assert(out(10L) == (20L, false), "higher-quality near-dup must win the election")
    assert(out(20L) == (20L, true))
    assert(out(30L) == (30L, true), "equal quality ties to the min id")
    assert(out(31L) == (30L, false))
    assert(out(40L) == (40L, true), "singletons keep themselves")
    spark.catalog.clearCache()
  }

  test("converged flag: exhausted iteration budget is visible, strict mode throws") {
    import spark.implicits._
    // 3-chain A–B–C: B near-dups both ends (34/42 ≈ 0.81 shingle Jaccard),
    // the ends don't near-dup each other (30/46 ≈ 0.65 < 0.8), so the min
    // label needs TWO propagation rounds to reach C — maxIters=1 must
    // return split components and say so
    val mid = (1 to 40).map(i => s"tok$i")
    val a = (1 to 4).map(i => s"aa$i") ++ mid.drop(4)
    val c = mid.dropRight(4) ++ (1 to 4).map(i => s"cc$i")
    val docs = Seq(
      (1L, a.mkString(" ")), (2L, mid.mkString(" ")), (3L, c.mkString(" ")),
      (4L, (1 to 40).map(i => s"solo$i").mkString(" "))
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_chain").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val full = DedupClusters.clusters(spark, tmp)
    assert(full.filter(!col("converged")).count() == 0)
    val chain = full.filter(col("doc_id").isin(1L, 2L, 3L))
      .select("cluster_id").distinct().count()
    assert(chain == 1, "the 3-chain must be one component when converged")

    val cut = DedupClusters.clusters(spark, tmp, maxIters = 1)
    assert(cut.filter(col("converged")).count() == 0,
      "maxIters=1 cannot observe a zero-change round")
    val split = cut.filter(col("doc_id").isin(1L, 2L, 3L))
      .select("cluster_id").distinct().count()
    assert(split > 1, "the unconverged run should expose the split components")

    intercept[IllegalStateException] {
      DedupClusters.clusters(spark, tmp, maxIters = 1, strict = true)
    }
    spark.catalog.clearCache()
  }

  test("ordered=false emits no global sort (production escape hatch)") {
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    def globalSorts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case s: Sort if s.global => s }.size
    val unordered = DedupClusters.clusters(spark, TestSpark.sfDir, ordered = false)
    assert(globalSorts(unordered) == 0)
    val unorderedReport = graft.dedup.DedupReport.report(spark, TestSpark.sfDir, ordered = false)
    assert(globalSorts(unorderedReport) == 0)
    spark.catalog.clearCache()
  }
}
