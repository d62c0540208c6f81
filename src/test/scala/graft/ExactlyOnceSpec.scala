package graft

import graft.streaming.{Ev, ExactlyOnce}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once sink semantics: replayed batches do not duplicate output,
  * and dead-letter routing preserves every input row exactly once. */
class ExactlyOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_eo_$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  test("replayed batchId is skipped: output rows stay exactly-once") {
    import spark.implicits._
    val out = freshDir("replay")
    val writer = ExactlyOnce.idempotentBatchWriter(out)
    val batch = Seq(Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Ev(2, ts("2024-01-01 10:01:00"), "view", 2.0)).toDF()
    writer(batch, 0L)
    // crash-replay: same batchId arrives again (possibly with identical data)
    writer(batch, 0L)
    writer(batch.limit(1), 1L)
    val committed = ExactlyOnce.committedBatches(spark, out)
    assert(committed.size == 2)
    val rows = spark.read.parquet(committed: _*)
    assert(rows.count() == 3, "replay duplicated the sink output")
  }

  test("uncommitted directory (crash before marker) is not readable as committed") {
    import spark.implicits._
    val out = freshDir("crash")
    val batch = Seq(Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0)).toDF()
    // simulate the crash window: data written, marker never created
    batch.write.mode("overwrite").parquet(s"$out/batch=7")
    assert(ExactlyOnce.committedBatches(spark, out).isEmpty)
    assert(!ExactlyOnce.isCommitted(spark, out, 7L))
    // the replay commits it properly
    ExactlyOnce.idempotentBatchWriter(out)(batch, 7L)
    assert(ExactlyOnce.committedBatches(spark, out).size == 1)
  }

  test("end-to-end through foreachBatch: stream restart does not duplicate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = freshDir("stream")
    val input = MemoryStream[Ev]
    val writer = ExactlyOnce.idempotentBatchWriter(out)
    val q = input.toDF().writeStream.foreachBatch(writer).start()
    try {
      input.addData(Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      // manual replay of batch 0 (what a checkpoint-recovered query does)
      writer(Seq(Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0)).toDF(), 0L)
      val rows = spark.read.parquet(ExactlyOnce.committedBatches(spark, out): _*)
      assert(rows.count() == 1)
    } finally q.stop()
  }

  test("dlq split: every row lands exactly once, bad rows carry the reason") {
    import spark.implicits._
    val df = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), "click", 5.0),
      Ev(2, ts("2024-01-01 10:01:00"), "view", -1.0),
      Ev(3, ts("2024-01-01 10:02:00"), "click", 0.0)).toDF()
    val (valid, dlq) = ExactlyOnce.dlqSplit(df, col("value") > 0.0, "non_positive_value")
    assert(valid.count() + dlq.count() == df.count())
    assert(valid.filter(col("value") <= 0.0).count() == 0)
    assert(dlq.select("dlq_reason").distinct().as[String].collect().toSeq ==
      Seq("non_positive_value"))
    assert(dlq.count() == 2)
  }
}
