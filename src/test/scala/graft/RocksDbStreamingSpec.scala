package graft

import graft.streaming.{Ev, StreamOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** State-heavy streaming soak under the RocksDB state store provider
  * (GraftSession.streamingBuilder's config): the same stateful operators
  * StreamingSpec covers, but over hundreds of keys and multiple microbatches,
  * run under BOTH providers — results must match exactly, and the RocksDB
  * run must show rocksdb custom metrics in the query progress (proof the
  * provider was actually engaged, not silently defaulted). */
class RocksDbStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Run `f` with the state store provider set (None = Spark default),
    * restoring the previous conf afterwards — the test session is shared. */
  private def withProvider[T](provider: Option[String])(f: => T): T = {
    val old = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None    => spark.conf.unset(ProviderKey)
    }
    try f finally old match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private val Users = 200

  /** Soak: every user gets a 2-event morning session and a 1-event noon
    * session; two later watermark pushes close them all. Returns the closed
    * sessions and the state operator's custom-metric names. */
  private def sessionSoak(name: String): (Set[(Long, Long, Double)], Set[String]) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.statefulSessions(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData((0 until Users).map(u =>
        Ev(u, ts("2024-01-01 10:00:00"), "click", u * 1.0)))
      q.processAllAvailable()
      input.addData((0 until Users).map(u =>
        Ev(u, ts("2024-01-01 10:10:00"), "click", 1.0)))
      q.processAllAvailable()
      input.addData((0 until Users).map(u =>
        Ev(u, ts("2024-01-01 12:00:00"), "view", 2.0)))
      q.processAllAvailable()
      // two pushes: watermark advances on batch N, timeouts fire on N+1
      input.addData(Ev(Users + 1, ts("2024-01-01 16:00:00"), "click", 0.0))
      q.processAllAvailable()
      input.addData(Ev(Users + 1, ts("2024-01-01 20:00:00"), "click", 0.0))
      q.processAllAvailable()
      val metrics = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString)).toSet
      val out = spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value"))).toSet
      (out, metrics)
    } finally q.stop()
  }

  test("stateful sessionization: RocksDB provider engages and matches the default provider") {
    val (rocksOut, rocksMetrics) = withProvider(Some(Rocks))(sessionSoak("rocks_sess_soak"))
    val (defOut, _) = withProvider(None)(sessionSoak("default_sess_soak"))
    assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in progress — provider not engaged? metrics=$rocksMetrics")
    // every user's two sessions closed, under both providers, identically
    val expected = (0 until Users).flatMap(u =>
      Seq((u.toLong, 2L, u * 1.0 + 1.0), (u.toLong, 1L, 2.0))).toSet
    assert(rocksOut.intersect(expected) == expected,
      s"missing sessions under rocksdb: ${(expected -- rocksOut).take(5)}")
    assert(rocksOut == defOut, "provider changed the query result")
  }

  test("stream-stream interval join: RocksDB provider engages and matches the default provider") {
    import spark.implicits._
    def joinSoak(name: String): (Set[(Long, Double)], Set[String]) = {
      implicit val ctx = spark.sqlContext
      val clicks = MemoryStream[Ev]
      val buys = MemoryStream[Ev]
      val q = StreamOps.intervalJoin(clicks.toDF(), buys.toDF(), intervalSeconds = 600)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        clicks.addData((0 until Users).map(u =>
          Ev(u, ts("2024-01-01 10:00:00"), "click", 1.0)))
        buys.addData((0 until Users).map(u =>
          Ev(u, ts("2024-01-01 10:05:00"), "purchase", u * 2.0)))
        buys.addData((0 until Users).map(u =>
          Ev(u, ts("2024-01-01 10:30:00"), "purchase", -1.0))) // outside interval
        q.processAllAvailable()
        val metrics = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString)).toSet
        val out = spark.table(name).collect()
          .map(r => (r.getAs[Long]("l_key"), r.getAs[Double]("r_value"))).toSet
        (out, metrics)
      } finally q.stop()
    }
    val (rocksOut, rocksMetrics) = withProvider(Some(Rocks))(joinSoak("rocks_join_soak"))
    val (defOut, _) = withProvider(None)(joinSoak("default_join_soak"))
    assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in progress — provider not engaged? metrics=$rocksMetrics")
    val expected = (0 until Users).map(u => (u.toLong, u * 2.0)).toSet
    assert(rocksOut == expected, s"unexpected join rows: ${(rocksOut -- expected).take(5)}")
    assert(rocksOut == defOut, "provider changed the join result")
  }
}
