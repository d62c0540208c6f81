package graft

import graft.streaming.{ExactlyOnce, StreamingHybridIndex}
import graft.text.HybridSearch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming wiring for hybrid-index ingest: an unbounded document
  * stream drains into `appendToIndex` through the foreachBatch sink, with
  * in-sink compaction, and the resulting index answers bit-identically to
  * a from-scratch rebuild over the union corpus. */
class StreamingHybridIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getAs[Long]("kw_score"),
      r.getAs[Long]("vec_score"), r.getAs[Double]("rrf_score"))).toSeq

  test("streamed appends + in-sink compaction match a full rebuild, exactly once") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // base corpus = 4/5 of the table (same adaptiveBits as the full table —
    // the append-geometry precondition the HybridIndexSpec soak documents)
    val baseDir = tmp("shi_base")
    docs.filter(col("doc_id") % 5 =!= 0)
      .write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    val idx = tmp("shi_idx")
    HybridSearch.buildIndex(spark, baseDir, idx)

    val slice = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(slice.length >= 4, s"stream slice too small: ${slice.length}")
    val (first, second) = slice.splitAt(slice.length / 2)

    // compactEvery = 2: batch 0 stays an append, batch 1 triggers a fold
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingHybridIndex.indexSink(idx, compactEvery = 2))
      .option("checkpointLocation", tmp("shi_ckpt"))
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // the fold consumed both committed batches
    assert(ExactlyOnce.committedBatches(spark, s"$idx/appends").isEmpty,
      "in-sink compaction left committed append dirs behind")

    // the in-sink-compaction crash window: batch 1's fold ran (its marker
    // dir is gone) but the stream "crashed" before the checkpoint advanced,
    // so foreachBatch redelivers batch 1. The folded-batch watermark in
    // corpus/meta (max folded batchId) must reject the replay outright —
    // no duplicate append dir, answers unchanged.
    val before = rows(HybridSearch.hybridSearchIndexed(spark, dir, idx))
    val appended = HybridSearch.appendToIndex(
      spark, second.toSeq.toDF("doc_id", "text"), idx, 1L)
    assert(!appended, "replay of a folded batchId re-appended past the watermark")
    assert(ExactlyOnce.committedBatches(spark, s"$idx/appends").isEmpty,
      "watermark-rejected replay still left an append dir")
    assert(rows(HybridSearch.hybridSearchIndexed(spark, dir, idx)) === before,
      "post-compaction replay changed query answers")

    // bit-parity with a from-scratch rebuild over the full documents table
    val rebuilt = tmp("shi_rebuilt")
    HybridSearch.buildIndex(spark, dir, rebuilt)
    for (probe <- Seq(false, true)) {
      val inc = rows(HybridSearch.hybridSearchIndexed(spark, dir, idx, probe = probe))
      val ref = rows(HybridSearch.hybridSearchIndexed(spark, dir, rebuilt, probe = probe))
      assert(inc === ref, s"probe=$probe: streamed index diverged from the rebuild")
    }

    // a genuinely NEW batchId above the watermark still appends (checked
    // last — it adds an out-of-corpus doc, so parity ran before it)
    assert(HybridSearch.appendToIndex(
      spark, Seq((999999L, "fresh post-fold doc")).toDF("doc_id", "text"), idx, 2L),
      "new batchId above the watermark was wrongly skipped")
  }

  test("driver replay query is bit-identical to the flat hybrid search") {
    // the parity claim the streaming_hybrid_index_replay oracle rides:
    // settled-subset build + streamed src0 slice + in-sink folds ==
    // flat hybridSearch over the full documents table
    val streamed = rows(
      graft.streaming.StreamingHybridIndex.streamingHybridIndexReplay(spark, dir))
    val flat = rows(HybridSearch.hybridSearch(spark, dir))
    assert(streamed === flat, "streamed-index replay diverged from flat hybrid search")
  }
}
