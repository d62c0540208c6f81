package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once sink semantics for foreachBatch pipelines (reference:
  * src/streaming/fault_tolerance_exactly_once.py — `IdempotentProducer` /
  * `ExactlyOnceConsumer` / `DuplicateDetector` / dead-letter queue; the
  * reference builds these on Kafka transactions + a Redis Bloom filter).
  *
  * Spark-native shape: Structured Streaming already gives exactly-once
  * STATE via the checkpoint, but foreachBatch SINKS are only at-least-once —
  * after a crash the last batch replays. The two pieces the reference's
  * producer supplies are re-expressed here:
  *
  *  - `idempotentBatchWriter`: a batchId-keyed transactional parquet write —
  *    each batch lands in its own directory, committed by an atomic marker
  *    rename; a replayed batchId sees its marker and skips. Write-then-
  *    rename gives the same replay-dedup guarantee as the reference's
  *    message-id Bloom filter, with zero external services.
  *  - `dlqSplit`: dead-letter routing as a pure transform — rows failing the
  *    validity predicate divert to a DLQ frame carrying the error reason,
  *    the reference's `_send_to_dead_letter_queue` contract.
  *
  * Scale: the writer adds one marker rename per micro-batch (constant); the
  * DLQ split is a predicate projection. Neither shuffles.
  */
object ExactlyOnce {

  /** Commit marker name for a batch directory. */
  private def marker(outDir: String, batchId: Long) =
    new Path(s"$outDir/batch=$batchId/_GRAFT_COMMITTED")

  /** True iff this batchId already committed (a replay after crash/restart). */
  def isCommitted(spark: org.apache.spark.sql.SparkSession, outDir: String,
                  batchId: Long): Boolean = {
    val m = marker(outDir, batchId)
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(m)
  }

  /** Atomically create the commit marker for a batch directory — the commit
    * point of the write-then-rename protocol, exposed for sinks that stage
    * more than one directory per batch (e.g. StreamingNearDup writes the
    * decision output AND an index append, then marks each in turn). */
  def commit(spark: org.apache.spark.sql.SparkSession, outDir: String,
             batchId: Long): Unit = {
    val m = marker(outDir, batchId)
    m.getFileSystem(spark.sparkContext.hadoopConfiguration).create(m, true).close()
  }

  /** foreachBatch body with exactly-once sink semantics: skip committed
    * batchIds, else write parquet then atomically create the commit marker.
    * A crash between write and marker leaves an uncommitted directory that
    * the replay simply overwrites — readers must filter on the marker (or
    * list via `committedBatches`). */
  def idempotentBatchWriter(outDir: String): (DataFrame, Long) => Unit =
    (df, batchId) => {
      val spark = df.sparkSession
      if (!isCommitted(spark, outDir, batchId)) {
        df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        val m = marker(outDir, batchId)
        m.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .create(m, true).close()
      }
    }

  /** Directories of committed batches under `outDir` (the read side of the
    * marker protocol). */
  def committedBatches(spark: org.apache.spark.sql.SparkSession, outDir: String): Seq[String] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, "_GRAFT_COMMITTED")))
      .map(_.getPath.toString)
  }

  /** Dead-letter routing: rows passing `isValid` flow on; the rest divert to
    * a DLQ frame stamped with the rejection reason and the source batch. */
  def dlqSplit(df: DataFrame, isValid: org.apache.spark.sql.Column,
               reason: String): (DataFrame, DataFrame) = {
    val valid = df.filter(isValid)
    val dlq = df.filter(!coalesce(isValid, lit(false)))
      .withColumn("dlq_reason", lit(reason))
    (valid, dlq)
  }
}
