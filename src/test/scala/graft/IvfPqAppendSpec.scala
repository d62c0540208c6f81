package graft

import graft.ann.IvfPq
import graft.streaming.StreamingIvfPqIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqAppendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("appended vectors are findable and queryable; full id space covered") {
    val out = IvfPq.annIvfPqAppend(spark, dir).persist()
    // queries 4 and 9 are appended ids — they must answer
    val qids = out.select("query_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(qids.sameElements(0L until 10L), qids.toSeq.toString)
    // appended vectors (vec_id % 5 == 4) appear among results somewhere
    assert(out.filter(col("vec_id") % 5 === 4).count() > 0,
      "no appended vector ever surfaced in any top-k")
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("batch-count invariance: 1/3/5 streaming batches equal the 2-batch path") {
    val base = IvfPq.annIvfPqAppend(spark, dir)
      .collect().map(_.toString).sorted
    Seq(1, 3, 5).foreach { n =>
      val streamed = StreamingIvfPqIndex
        .streamingIvfPqAppendReplay(spark, dir, nBatches = n)
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(base), s"nBatches=$n diverged")
    }
    spark.catalog.clearCache()
  }

  test("replaying a committed append batch is a no-op (exactly-once)") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_eo").toString
    IvfPq.buildIvfPqIndexFrom(spark, emb.filter(col("vec_id") % 5 =!= 4), idx)
    val slice = emb.filter(col("vec_id") % 5 === 4)
    IvfPq.appendToIvfPqIndex(spark, idx, slice, 0L)
    val before = spark.read.parquet(s"$idx/appends/batch=0/codes").count()
    // crash-replay with a DIFFERENT (e.g. duplicated) frame must be skipped
    IvfPq.appendToIvfPqIndex(spark, idx, slice.unionAll(slice), 0L)
    val after = spark.read.parquet(s"$idx/appends/batch=0/codes").count()
    assert(after == before, "committed batch was overwritten on replay")
    spark.catalog.clearCache()
  }

  test("appended codes share the frozen geometry (valid list and code ranges)") {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_geom2").toString
    IvfPq.buildIvfPqIndexFrom(spark, emb.filter(col("vec_id") % 5 =!= 4), idx)
    IvfPq.appendToIvfPqIndex(spark, idx, emb.filter(col("vec_id") % 5 === 4), 0L)
    val ap = spark.read.parquet(s"$idx/appends/batch=0/codes")
    assert(ap.filter(col("cluster") < 0 || col("cluster") >= IvfPq.NLists)
      .count() == 0)
    (0 until graft.ann.Pq.SubSpaces).foreach { m =>
      assert(ap.filter(col(s"c$m") < 0 || col(s"c$m") >= graft.ann.Pq.CodeBook)
        .count() == 0, s"code c$m out of range")
    }
    assert(ap.count() == emb.filter(col("vec_id") % 5 === 4).count())
    spark.catalog.clearCache()
  }
}
