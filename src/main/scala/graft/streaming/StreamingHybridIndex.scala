package graft.streaming

import graft.text.HybridSearch
import org.apache.spark.sql.DataFrame

/** Streaming ingest for the persisted hybrid lexical+vector index — the
  * glue that closes the lambda-architecture arc for the VECTOR side the
  * way [[StreamingNearDup]] closes it for the MinHash side: an unbounded
  * document stream feeds `HybridSearch.appendToIndex` batch by batch,
  * exactly once, while readers keep serving the settled corpus plus the
  * committed appends.
  *
  * All of the hard invariants live in [[graft.text.HybridSearch]] already
  * (batchId commit markers, build-time geometry reuse, crash-recoverable
  * compaction, reader-side append union + dedupe); this object only wires
  * them into a `foreachBatch` sink:
  *
  * {{{
  *   docsStream.writeStream
  *     .foreachBatch(StreamingHybridIndex.indexSink(indexDir))
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * Exactly-once: Structured Streaming replays a micro-batch after a crash
  * with the SAME batchId; appendToIndex sees the committed marker and
  * skips, so a replayed batch never double-inserts (the
  * [[ExactlyOnce]] protocol — marker written AFTER both parquet parts).
  * The guarantee holds ACROSS the compaction boundary too: compaction
  * deletes batch dirs (markers included) but stamps a folded-batch
  * watermark into corpus/meta, and appendToIndex rejects any batchId at
  * or below it — a redelivery after an in-sink fold is a no-op.
  *
  * Compaction: `compactEvery = n` folds committed appends into the corpus
  * after every n-th batch, INSIDE the sink — micro-batches are sequential
  * per query, so the fold never races an append from the same stream.
  * Concurrent READERS of the same index dir during the fold are safe only
  * through the recover-on-entry protocol (an interrupted swap completes on
  * their next entry); a reader mid-plan across the swap re-lists files —
  * the standard compaction/ingest exclusion applies, so schedule folds in
  * query-quiet windows for a shared index. `compactEvery = 0` (default)
  * never compacts — run [[graft.text.HybridSearch.compactIndex]] as the
  * offline maintenance step instead. */
object StreamingHybridIndex {

  /** `foreachBatch` sink appending each micro-batch of documents
    * (`doc_id`, `text`) to a prebuilt hybrid index at `indexDir`. */
  def indexSink(indexDir: String, compactEvery: Int = 0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      HybridSearch.appendToIndex(spark, batch, indexDir, batchId)
      if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
        HybridSearch.compactIndex(spark, indexDir)
    }
}
