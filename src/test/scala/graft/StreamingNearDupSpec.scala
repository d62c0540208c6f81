package graft

import graft.dedup.IncrementalDedup
import graft.streaming.{ExactlyOnce, StreamingNearDup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch parity for the incremental near-dup detector: the same
  * corpus + batch slice, run once through the whole-batch detector and once
  * as two id-ordered micro-batches through the foreachBatch sink against a
  * persisted index, must produce identical decisions — plus the marker
  * protocol's replay-dedup guarantee. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed micro-batch decisions equal the whole-batch detector's") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= IncrementalDedup.BatchSource)
    val indexDir = tmp("snd_idx")
    val outDir = tmp("snd_out")
    StreamingNearDup.buildCorpusIndex(corpus, indexDir)

    // the batch slice, id-ordered (arrival order = id order is the parity
    // precondition — see StreamingNearDup scaladoc), split into two halves
    val slice = docs.filter(col("source") === IncrementalDedup.BatchSource)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(slice.length >= 4, s"batch slice too small for a 2-batch split: ${slice.length}")
    val (first, second) = slice.splitAt(slice.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(StreamingNearDup.nearDupSink(indexDir, outDir))
      .option("checkpointLocation", tmp("snd_ckpt"))
      .start()
    try {
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(second.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val committed = ExactlyOnce.committedBatches(spark, outDir)
    assert(committed.size == 2, s"expected 2 committed batches, got $committed")
    val streamed = spark.read.parquet(committed: _*)
      .select("doc_id", "decision", "keeper_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    val batch = IncrementalDedup.incrementalNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    assert(streamed == batch,
      s"stream/batch diverged: onlyStream=${streamed -- batch} onlyBatch=${batch -- streamed}")
    // the stream found real work (corpus matches exist at sf0.001)
    assert(streamed.exists(_._2 != "keep"), "no non-keep decisions — parity check vacuous")
  }

  test("crash between index commit and output commit replays to identical decisions") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= IncrementalDedup.BatchSource)
    val indexDir = tmp("snd_idx3")
    val outDir = tmp("snd_out3")
    StreamingNearDup.buildCorpusIndex(corpus, indexDir)
    val slice = docs.filter(col("source") === IncrementalDedup.BatchSource)
      .select("doc_id", "text").limit(30)
    val sink = StreamingNearDup.nearDupSink(indexDir, outDir)
    sink(slice, 0L)
    val committed = spark.read.parquet(s"$outDir/batch=0")
      .orderBy("doc_id").collect().toSeq
    // simulate the crash window: index marker exists, output marker lost —
    // the replay must re-probe WITH the batch's own docs already settled in
    // the index and still produce the same decisions (the scaladoc's
    // candidate-filter argument, verified)
    assert(new java.io.File(s"$indexDir/batch=0/_GRAFT_COMMITTED").exists())
    assert(new java.io.File(s"$outDir/batch=0/_GRAFT_COMMITTED").delete())
    sink(slice, 0L)
    assert(new java.io.File(s"$outDir/batch=0/_GRAFT_COMMITTED").exists())
    val replayed = spark.read.parquet(s"$outDir/batch=0")
      .orderBy("doc_id").collect().toSeq
    assert(replayed == committed,
      "replay with the batch already in the index changed decisions")
  }

  test("compaction folds batch appends into the corpus and upgrades matches") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= IncrementalDedup.BatchSource)
    val indexDir = tmp("snd_idx4")
    val outDir = tmp("snd_out4")
    StreamingNearDup.buildCorpusIndex(corpus, indexDir)
    val slice = docs.filter(col("source") === IncrementalDedup.BatchSource)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sink = StreamingNearDup.nearDupSink(indexDir, outDir)
    sink(slice.take(10).toSeq.toDF("doc_id", "text"), 0L)
    sink(slice.slice(10, 20).toSeq.toDF("doc_id", "text"), 1L)
    assert(StreamingNearDup.compactIndex(spark, indexDir) == 2)
    assert(ExactlyOnce.committedBatches(spark, indexDir).isEmpty,
      "batch dirs survived compaction")
    // re-submit batch 0's TEXTS under fresh ids: each new doc is an exact
    // twin of a folded (now settled) doc with a DIFFERENT id, so every doc
    // with enough tokens to shingle must decide drop_near_corpus — the
    // batch-side rule (smaller id only) no longer applies to folded docs
    val fresh = slice.take(10).map { case (id, t) => (id + 10000000L, t) }
    sink(fresh.toSeq.toDF("doc_id", "text"), 2L)
    val d = spark.read.parquet(s"$outDir/batch=2")
    assert(d.count() == 10)
    assert(d.filter(col("decision") === "drop_near_batch").count() == 0,
      "a folded doc still matched as batch-side")
    val shingleable = fresh.count(_._2.trim.split("\\s+").length >= 3).toLong
    assert(d.filter(col("decision") === "drop_near_corpus").count() == shingleable,
      "not every shingleable twin settled as a corpus match")
  }

  test("replayed batchId is skipped by the marker protocol") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= IncrementalDedup.BatchSource)
    val indexDir = tmp("snd_idx2")
    val outDir = tmp("snd_out2")
    StreamingNearDup.buildCorpusIndex(corpus, indexDir)
    val slice = docs.filter(col("source") === IncrementalDedup.BatchSource)
      .select("doc_id", "text").limit(20)
    val sink = StreamingNearDup.nearDupSink(indexDir, outDir)
    sink(slice, 0L)
    val firstRun = spark.read.parquet(s"$outDir/batch=0")
      .orderBy("doc_id").collect().toSeq
    val marker = new java.io.File(s"$outDir/batch=0/_GRAFT_COMMITTED")
    val mtime = marker.lastModified()
    sink(slice, 0L) // replay after "crash": marker present → full skip
    assert(marker.lastModified() == mtime, "replay re-wrote a committed batch")
    val afterReplay = spark.read.parquet(s"$outDir/batch=0")
      .orderBy("doc_id").collect().toSeq
    assert(afterReplay == firstRun)
  }
}
