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

  /** Recursive dir copy for crash-window simulation. */
  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("compaction soak: mid-stream compaction + both crash windows keep decisions bit-identical") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= IncrementalDedup.BatchSource)
    val slice = docs.filter(col("source") === IncrementalDedup.BatchSource)
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(slice.length >= 12, s"slice too small for a 6-batch soak: ${slice.length}")
    val k = slice.length / 6
    val chunks = (0 until 5).map(i => slice.slice(i * k, (i + 1) * k).toSeq)
      .toVector :+ slice.drop(5 * k).toSeq
    assert(chunks.length == 6 && chunks.forall(_.nonEmpty))

    // ---- run B: stream with compaction after batch 2, crash sims at 3 and 4
    val idxB = tmp("snd_soak_idx")
    val outB = tmp("snd_soak_out")
    StreamingNearDup.buildCorpusIndex(corpus, idxB)
    val sinkB = StreamingNearDup.nearDupSink(idxB, outB)
    (0 to 2).foreach(i => sinkB(chunks(i).toSeq.toDF("doc_id", "text"), i.toLong))
    // stash batch=1's committed append before compaction deletes it
    val stash = tmp("snd_soak_stash")
    copyDir(s"$idxB/batch=1", s"$stash/batch=1")
    assert(StreamingNearDup.compactIndex(spark, idxB) == 3)
    // crash window 1 (mid-swap): corpus renamed away, staged fully present —
    // the state between compactIndex's two renames. The next probe must
    // complete the swap instead of failing on the missing corpus dir.
    val fsB = new org.apache.hadoop.fs.Path(idxB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fsB.rename(new org.apache.hadoop.fs.Path(s"$idxB/corpus"),
      new org.apache.hadoop.fs.Path(s"$idxB/__corpus_staged")))
    sinkB(chunks(3).toSeq.toDF("doc_id", "text"), 3L)
    assert(fsB.exists(new org.apache.hadoop.fs.Path(s"$idxB/corpus")),
      "recoverCorpus did not complete the interrupted swap")
    // crash window 2 (post-swap, stale batch dir): batch=1's docs are now in
    // the corpus AND back as a committed batch append — corpus membership
    // must win candidate dedup, not arrival luck
    copyDir(s"$stash/batch=1", s"$idxB/batch=1")
    sinkB(chunks(4).toSeq.toDF("doc_id", "text"), 4L)
    sinkB(chunks(5).toSeq.toDF("doc_id", "text"), 5L)

    // ---- run C: the compaction-equivalence reference — batches 0..2 settle
    // into the corpus from the START, then 3..5 stream against it
    val idxC = tmp("snd_soak_idxc")
    val outC = tmp("snd_soak_outc")
    StreamingNearDup.buildCorpusIndex(
      corpus.select("doc_id", "text")
        .unionByName(chunks.take(3).flatten.toSeq.toDF("doc_id", "text")), idxC)
    val sinkC = StreamingNearDup.nearDupSink(idxC, outC)
    (3 to 5).foreach(i => sinkC(chunks(i).toSeq.toDF("doc_id", "text"), i.toLong))

    def decisions(outDir: String, b: Int) =
      spark.read.parquet(s"$outDir/batch=$b")
        .select("doc_id", "decision", "keeper_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    (3 to 5).foreach { b =>
      val db = decisions(outB, b)
      val dc = decisions(outC, b)
      assert(db == dc,
        s"batch $b diverged from the folded-corpus reference: onlyB=${db -- dc} onlyC=${dc -- db}")
    }
    assert((3 to 5).exists(b => decisions(outB, b).exists(_._2 != "keep")),
      "no non-keep decisions after compaction — soak check vacuous")
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
