package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-source streaming: the production shape (a drop directory of parquet
  * files consumed incrementally) driving the same windowed aggregation the
  * MemoryStream tests pin semantically. */
class FileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parquet file source streams through windowedAgg incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("filestream").toString
    val in = s"$dir/in"
    new java.io.File(in).mkdirs()

    def batch(path: String, rows: Seq[(Long, String, String, Double)]): Unit =
      rows.toDF("user_id", "ts_s", "event_type", "value")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(path)

    batch(in, Seq((1L, "2024-01-01 10:05:00", "click", 1.0),
                  (2L, "2024-01-01 10:20:00", "click", 2.0)))

    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = StreamOps.windowedAgg(stream, watermark = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("fs_test").outputMode("append").start()
    try {
      q.processAllAvailable()
      // second file advances the watermark past the first window
      batch(in, Seq((3L, "2024-01-01 14:00:00", "view", 5.0)))
      q.processAllAvailable()
      val out = spark.table("fs_test").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("events_count")))
      assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L)), out.mkString(";"))
    } finally q.stop()
  }
}
