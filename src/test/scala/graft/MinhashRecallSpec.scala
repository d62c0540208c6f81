package graft

import graft.dedup.MinHashLsh
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinhashRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("audit invariants: found <= exact, missed = exact - found, bins well-formed") {
    val out = MinHashLsh.minhashRecallAudit(spark, dir).persist()
    assert(out.filter(col("found_pairs") > col("exact_pairs")).count() == 0)
    assert(out.filter(
      col("missed_pairs") =!= col("exact_pairs") - col("found_pairs")).count() == 0)
    val bins = out.select("jaccard_bin").collect().map(_.getString(0)).toSet
    assert(bins.subsetOf(Set("0.80-0.85", "0.85-0.90", "0.90-0.95", "0.95+")))
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("a planted near-dup family is fully counted in the exact leg") {
    import spark.implicits._
    // 10 docs sharing a long base text with one divergent tail token each:
    // every pair shares most trigrams -> all 45 pairs are exact near-dups
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("mr_plant").toString
    (0 until 10).map(i => (i.toLong, s"$base tail$i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = MinHashLsh.minhashRecallAudit(spark, tmp).persist()
    val exact = out.agg(sum("exact_pairs")).head.getLong(0)
    val found = out.agg(sum("found_pairs")).head.getLong(0)
    assert(exact == 45L, s"all 45 family pairs must clear 0.8 (got $exact)")
    // identical 38-of-40-trigram overlap: banding recall is ~1 at j≈0.95
    assert(found >= 40L, s"banding should catch nearly all pairs (got $found)")
    out.unpersist()
    spark.catalog.clearCache()
  }
}
