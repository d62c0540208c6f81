package graft.streaming

import graft.ann.Ann
import org.apache.spark.sql.DataFrame

/** Streaming ingest for the persisted IVF ANN index — the vector-index
  * twin of [[StreamingHybridIndex]]: an unbounded embedding stream drains
  * into `Ann.appendToIvfIndex` batch by batch, exactly once, while readers
  * keep probing the settled lists plus the committed appends.
  *
  * The hard invariants live in [[graft.ann.Ann]] already (frozen-geometry
  * assign-only appends, batchId commit markers, reader-side append union);
  * this object wires them into a `foreachBatch` sink:
  *
  * {{{
  *   embStream.writeStream
  *     .foreachBatch(StreamingIvfIndex.indexSink(indexDir))
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * Exactly-once: a crash-replayed micro-batch re-arrives with the SAME
  * batchId; appendToIvfIndex sees the committed marker and skips.
  * Compaction = the periodic quantizer refit ([[Ann.buildIvfIndex]] into a
  * fresh dir, swap at a query-quiet boundary) — assign-only appends never
  * mutate the settled lists, so there is no in-place fold to crash. */
object StreamingIvfIndex {

  /** `foreachBatch` sink appending each micro-batch of embeddings
    * (`vec_id`, `embedding`) to a prebuilt IVF index at `indexDir`. */
  def indexSink(indexDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      Ann.appendToIvfIndex(batch.sparkSession, indexDir, batch, batchId)

  /** Driver-gated replay of the streaming-ingest arc: build the settled
    * index (vec_id % 5 ≠ 4, the [[Ann.annIvfAppend]] split), push the
    * appended fifth through [[indexSink]] as `nBatches` contiguous
    * id-ordered micro-batches, probe base ∪ appends. Assign-only appends
    * are independent per batch (each is one frozen-centroid argmin; the
    * reader unions committed lists), so HOW the fifth is batched cannot
    * change the result — the streamed index answers bit-for-bit what the
    * two-batch [[Ann.annIvfAppend]] computes, and this query rides its
    * oracle verbatim. The driver thereby hash-gates the streaming sink
    * path itself, not just its spec (the streaming_neardup_replay /
    * streaming_hybrid_index_replay recipe, third application). */
  def streamingIvfAppendReplay(spark: org.apache.spark.sql.SparkSession,
                               dir: String, nBatches: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, dir)
    val idx = ReplayScratch.dir("sivf_replay_idx")
    Ann.buildIvfIndexFrom(spark, emb.filter(col("vec_id") % 5 =!= 4), idx,
      withVectors = false) // scratch index never serves annRecall's audit leg
    val slice = emb.filter(col("vec_id") % 5 === 4)
      .select("vec_id", "embedding")
    val banded = graft.operators.RankOps
      .withGlobalNtile(slice, "__b", nBatches, Seq(col("vec_id")))
      .localCheckpoint(false) // one rank pass, reused by every micro-batch filter
    val sink = indexSink(idx)
    (1 to nBatches).foreach { k =>
      sink(banded.filter(col("__b") === k).select("vec_id", "embedding"),
        (k - 1).toLong)
    }
    Ann.ivfTopKIndexedWithAppends(spark, dir, idx)
      .orderBy(col("query_id"), col("rank"))
  }
}
