package graft.streaming

import graft.ann.IvfPq
import org.apache.spark.sql.DataFrame

/** Streaming ingest for the persisted IVFADC index — the compressed-index
  * twin of [[StreamingIvfIndex]], closing exactly-once streaming ingest
  * across ALL FOUR persisted index families (MinHash / hybrid / IVF /
  * IVFADC). The hard invariants live in [[graft.ann.IvfPq]] (frozen
  * coarse + codebook geometry, assign-only appends, batchId commit
  * markers, reader-side append union); this object wires them into a
  * `foreachBatch` sink. Compaction = the periodic full rebuild
  * ([[IvfPq.buildIvfPqIndex]] into a fresh dir, swap at a query-quiet
  * boundary). */
object StreamingIvfPqIndex {

  /** `foreachBatch` sink appending each micro-batch of embeddings
    * (`vec_id`, `embedding`) to a prebuilt IVFADC index at `indexDir`. */
  def indexSink(indexDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      IvfPq.appendToIvfPqIndex(batch.sparkSession, indexDir, batch, batchId)

  /** Driver-gated replay: build the settled index (vec_id % 5 ≠ 4), push
    * the appended fifth through [[indexSink]] as `nBatches` contiguous
    * id-ordered micro-batches, answer over base ∪ appends. Assign-only
    * appends are independent per batch (each row's list and codes depend
    * only on the frozen geometry), so HOW the fifth is batched cannot
    * change the result — the streamed index answers bit-for-bit what the
    * two-batch [[IvfPq.annIvfPqAppend]] computes and rides its oracle
    * verbatim (the fourth application of the streaming-replay recipe). */
  def streamingIvfPqAppendReplay(spark: org.apache.spark.sql.SparkSession,
                                 dir: String, nBatches: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val idx = ReplayScratch.dir("sivfpq_replay_idx")
    IvfPq.buildIvfPqIndexFrom(spark, emb.filter(col("vec_id") % 5 =!= 4), idx)
    val slice = emb.filter(col("vec_id") % 5 === 4)
    val banded = graft.operators.RankOps
      .withGlobalNtile(slice, "__b", nBatches, Seq(col("vec_id")))
      .localCheckpoint(false) // one rank pass, reused by every micro-batch filter
    val sink = indexSink(idx)
    (1 to nBatches).foreach { k =>
      sink(banded.filter(col("__b") === k).select("vec_id", "embedding"),
        (k - 1).toLong)
    }
    IvfPq.ivfPqTopKIndexedWithAppends(spark, dir, idx)
  }
}
