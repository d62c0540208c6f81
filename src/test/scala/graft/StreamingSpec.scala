package graft

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling windows aggregate per hour and emit on watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.windowedAgg(input.toDF(), watermark = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("win_test").outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:15:00"), "click", 2.0),
        Ev(1, ts("2024-01-01 10:20:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far past 11:10 so the 10:00 window closes
      input.addData(Ev(3, ts("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("win_test").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("events_count"), r.getAs[Double]("total_value")))
      assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)), out.mkString(";"))
      assert(out.contains(("2024-01-01 10:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions via event-time timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.statefulSessions(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_test").outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 10:10:00"), "click", 2.0),
        Ev(2, ts("2024-01-01 10:00:00"), "view", 4.0))
      q.processAllAvailable()
      // push watermark beyond user 1/2 session timeouts
      input.addData(Ev(3, ts("2024-01-01 13:00:00"), "click", 0.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts("2024-01-01 16:00:00"), "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      assert(out.contains((1L, 2L, 3.0)), out.mkString(";"))
      assert(out.contains((2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("sliding windows land each event in len/slide overlapping windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.slidingWindowAgg(input.toDF(), watermark = "10 minutes",
        windowLen = "1 hour", slide = "30 minutes")
      .writeStream.format("memory").queryName("slide_test").outputMode("append").start()
    try {
      input.addData(Ev(1, ts("2024-01-01 10:40:00"), "click", 2.0))
      q.processAllAvailable()
      input.addData(Ev(3, ts("2024-01-01 14:00:00"), "click", 1.0)) // close windows
      q.processAllAvailable()
      val starts = spark.table("slide_test").collect()
        .filter(_.getAs[Double]("total_value") == 2.0)
        .map(_.getAs[java.sql.Timestamp]("window_start").toString).sorted
      // 10:40 event belongs to the [10:00,11:00) and [10:30,11:30) windows
      assert(starts.toSeq == Seq("2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0"), starts.mkString(";"))
    } finally q.stop()
  }

  test("streaming dedup keeps first row per key within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.dedupStream(input.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_stream_test").outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 10:01:00"), "click", 99.0), // dup key inside horizon
        Ev(1, ts("2024-01-01 10:02:00"), "view", 7.0))
      q.processAllAvailable()
      val out = spark.table("dedup_stream_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
      assert(out.toSet == Set((1L, "click", 1.0), (1L, "view", 7.0)), out.mkString(";"))
    } finally q.stop()
  }

  test("built-in session windows merge events within the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.sessionWindowAgg(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sw_test").outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 10:20:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 12:00:00"), "click", 7.0))
      q.processAllAvailable()
      input.addData(Ev(9, ts("2024-01-01 15:00:00"), "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("sw_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
      assert(out.contains((1L, 2L, 2.0)), out.mkString(";"))
      assert(out.contains((1L, 1L, 7.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches same-user events inside the interval only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = StreamOps.intervalJoin(clicks.toDF(), buys.toDF(), intervalSeconds = 600)
      .writeStream.format("memory").queryName("ssj_test").outputMode("append").start()
    try {
      clicks.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:00:00"), "click", 1.0))
      buys.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "purchase", 9.0),  // inside 10 min
        Ev(2, ts("2024-01-01 10:30:00"), "purchase", 5.0),  // outside
        Ev(3, ts("2024-01-01 10:05:00"), "purchase", 3.0))  // no matching click
      q.processAllAvailable()
      val out = spark.table("ssj_test").collect()
        .map(r => (r.getAs[Long]("l_key"), r.getAs[String]("r_type"), r.getAs[Double]("r_value")))
      assert(out.toSeq == Seq((1L, "purchase", 9.0)), out.mkString(";"))
    } finally q.stop()
  }

  test("streaming curation applies the batch funnel rules per microbatch, stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // same rule fixtures as the batch funnel spec: "good" passes every
    // gate; the others each fail one
    val good = "the data and the table of a join is that it works in practice"
    val short = "too short"
    val repeated = ("spam " * 14).trim                       // top-word frac 1.0
    val symbols = "the data and the table of a join is that " + "#!@%^&*()[]{}<>~~" * 3
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.curationStream(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cur_stream").outputMode("append").start()
    try {
      input.addData((1L, good), (2L, short))
      q.processAllAvailable()
      input.addData((3L, repeated), (4L, symbols))          // second microbatch
      q.processAllAvailable()
      val out = spark.table("cur_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_kept")).toMap
      assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false), out)
      // decisions match the batch ladder exactly
      val tmp = java.nio.file.Files.createTempDirectory("curstream").toString
      Seq((1L, good, "en", "s0"), (2L, short, "en", "s0"),
        (3L, repeated, "en", "s0"), (4L, symbols, "en", "s0"))
        .toDF("doc_id", "text", "lang", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val batch = graft.text.TrainPrep.funnelFlagsOf(
          Tables.documents(spark, tmp))
        .select("doc_id", "k4").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("k4")).toMap
      assert(batch == out, "stream and batch keep decisions diverge")
    } finally q.stop()
  }

  test("late-data contract: window aggregation judges lateness against the WINDOW, not the row ts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.windowedAgg(input.toDF(), watermark = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("late_win_test").outputMode("append").start()
    try {
      input.addData(Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()        // watermark -> 09:55
      input.addData(Ev(2, ts("2024-01-01 10:45:00"), "click", 2.0))
      q.processAllAvailable()        // watermark -> 10:35
      // out-of-order row BELOW the watermark (10:02 < 10:35) whose window
      // [10:00, 11:00) is still OPEN (end 11:00 > watermark): the documented
      // contract includes it — aggregation state lives until the watermark
      // passes the window END, so only window-expired rows drop
      input.addData(Ev(3, ts("2024-01-01 10:02:00"), "click", 4.0))
      q.processAllAvailable()
      input.addData(Ev(4, ts("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()        // watermark -> 13:50: 10:00 window closes + emits
      // beyond-watermark row for the CLOSED window: dropped silently — the
      // emitted result must not change and no second row may appear
      input.addData(Ev(5, ts("2024-01-01 10:50:00"), "click", 100.0))
      input.addData(Ev(6, ts("2024-01-01 14:30:00"), "view", 1.0))
      q.processAllAvailable()
      val rows10 = spark.table("late_win_test").collect()
        .filter(r => r.getAs[java.sql.Timestamp]("window_start").toString == "2024-01-01 10:00:00.0"
          && r.getAs[String]("event_type") == "click")
        .map(r => (r.getAs[Long]("events_count"), r.getAs[Double]("total_value"))).toSeq
      assert(rows10 == Seq((3L, 7.0)),
        s"10:00 click window must emit once with the in-threshold late row " +
          s"(3 events, 7.0) and without the expired one (100.0): $rows10")
    } finally q.stop()
  }

  test("late-data contract: dedupStream drops below-watermark rows even for unseen keys") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.dedupStream(input.toDF(), Seq("user_id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_dedup_test").outputMode("append").start()
    try {
      input.addData(Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()        // watermark -> 09:50
      input.addData(Ev(2, ts("2024-01-01 11:00:00"), "click", 1.0))
      q.processAllAvailable()        // watermark -> 10:50
      // unseen key BUT ts below the watermark: dropDuplicatesWithinWatermark
      // discards it outright (per-key state cannot be kept consistent for
      // rows the watermark already passed) — the boundary a window agg
      // would still accept
      input.addData(Ev(3, ts("2024-01-01 10:30:00"), "click", 1.0),
        Ev(4, ts("2024-01-01 11:05:00"), "click", 1.0))
      q.processAllAvailable()
      // replay of user 2 inside the watermark horizon dedups as usual
      input.addData(Ev(2, ts("2024-01-01 11:06:00"), "click", 9.0))
      q.processAllAvailable()
      val users = spark.table("late_dedup_test").collect()
        .map(_.getAs[Long]("user_id")).toSeq.sorted
      assert(users == Seq(1L, 2L, 4L),
        s"expected late user 3 dropped and user 2's replay deduped: $users")
    } finally q.stop()
  }
}
