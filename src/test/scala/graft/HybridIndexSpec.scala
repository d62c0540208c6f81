package graft

import graft.text.HybridSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted hybrid index: exact parity of the persisted-vector path
  * with the flat form, sublinearity + measured recall of the SRP probe, and
  * the pushed bucket filter the 100 TB story rides on. */
class HybridIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("hybrid_idx_spec").toString
    HybridSearch.buildIndex(spark, dir, d)
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getAs[Long]("kw_score"),
      r.getAs[Long]("vec_score"), r.getAs[Double]("rrf_score"))).toSeq

  test("persisted-vector path is bit-identical to the flat form") {
    val flat = rows(HybridSearch.hybridSearch(spark, dir))
    val indexed = rows(HybridSearch.hybridSearchIndexed(spark, dir, indexDir))
    assert(indexed === flat)
  }

  test("probe restricts the vector leg to bucket collisions (sublinear candidates)") {
    val meta = spark.read.parquet(s"$indexDir/meta").head
    val keys = HybridSearch.queryBkeys(
      graft.text.HybridSearch.q20Const(HybridSearch.DefaultQuery, meta.getInt(2)),
      meta.getInt(0), meta.getInt(1), meta.getInt(2), meta.getLong(3))
    val candN = spark.read.parquet(s"$indexDir/buckets")
      .filter(col("bkey").isin(keys: _*)).select("doc_id").distinct().count()
    val corpusN = Tables.documents(spark, dir).count()
    assert(candN > 0, "probe found no candidates at all")
    assert(candN < corpusN,
      s"probe candidate set ($candN) is not smaller than the corpus ($corpusN)")
    // the probed result still fuses a full top-k answer
    assert(HybridSearch.hybridSearchIndexed(spark, dir, indexDir, probe = true)
      .count() === 20)
  }

  test("probe recall vs the flat form, measured (LSH trade, not asserted exact)") {
    val flat = rows(HybridSearch.hybridSearch(spark, dir)).map(_._1).toSet
    val probed = rows(
      HybridSearch.hybridSearchIndexed(spark, dir, indexDir, probe = true))
      .map(_._1).toSet
    val overlap = (flat & probed).size.toDouble / flat.size
    // the kw leg is identical and the vec leg keeps every colliding doc, so
    // the fused top-20 stays close; the exact value is corpus-dependent
    assert(overlap >= 0.5, s"fused top-20 overlap $overlap collapsed")
  }

  test("probe's bucket read pushes the bkey IN-filter to the parquet scan") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      HybridSearch.hybridSearchIndexed(spark, dir, indexDir, probe = true)
        .explain("formatted")
    }
    val plan = out.toString
    assert(plan.contains("PushedFilters: [In(bkey"),
      "bkey IN-filter did not reach the bucket parquet scan")
    assert(!plan.contains("CartesianProduct"), "probe plan has a cartesian join")
  }

  test("interrupted build (no meta) rebuilds through ensureIndex's marker check") {
    // meta is written last: a dir with vecs/buckets but no meta is half-built
    val half = java.nio.file.Files.createTempDirectory("hybrid_idx_half").toString
    HybridSearch.buildIndex(spark, dir, half)
    val fs = new org.apache.hadoop.fs.Path(half)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$half/meta"), true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$half/meta")))
    HybridSearch.buildIndex(spark, dir, half) // overwrite-idempotent
    assert(spark.read.parquet(s"$half/meta").count() === 1)
  }
}
