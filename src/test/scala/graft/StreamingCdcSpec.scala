package graft

import graft.operators.Cdc
import graft.streaming.Ev
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming upsert: a change stream drained via foreachBatch,
  * each micro-batch collapsed with the same Cdc.applyChanges used in batch,
  * merged into a parquet snapshot — the reference's realtime_silver_processor
  * shape without the Kafka/Delta plumbing. */
class StreamingCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("foreachBatch CDC upsert converges to latest-state snapshot") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val snapshotDir = java.nio.file.Files.createTempDirectory("cdc_snap").toString + "/state"

    def mergeBatch(batch: DataFrame, id: Long): Unit = {
      val latest = Cdc.applyChanges(batch, Seq("user_id"), Seq("ts"), "event_type", deleteOp = "error")
      val existing =
        try spark.read.parquet(snapshotDir)
        catch { case _: Throwable => spark.emptyDataFrame }
      val merged =
        if (existing.isEmpty) latest
        else existing.join(latest.select("user_id"), Seq("user_id"), "left_anti")
          .unionByName(latest)
      merged.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(snapshotDir + "_tmp")
      spark.read.parquet(snapshotDir + "_tmp").write.mode(SaveMode.Overwrite).parquet(snapshotDir)
    }

    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream.foreachBatch(mergeBatch _).start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData(
        Ev(1, ts("2024-01-01 11:00:00"), "purchase", 9.0), // supersedes user 1
        Ev(3, ts("2024-01-01 11:01:00"), "error", 0.0))    // "delete" op filtered
      q.processAllAvailable()
      val state = spark.read.parquet(snapshotDir).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("event_type")).toMap
      assert(state == Map(1L -> "purchase", 2L -> "view"))
    } finally q.stop()
  }
}
