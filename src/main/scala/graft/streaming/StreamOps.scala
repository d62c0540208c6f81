package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A streaming event (mirror of the events table's core columns). */
case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

/** Mutable session accumulator kept in GroupState. */
case class SessionState(start: Long, end: Long, nEvents: Long, totalValue: Double)

/** Emitted when a session closes (event-time timeout past the gap). */
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

/** Structured Streaming operators (reference:
  * src/streaming/spark_structured_streaming.py, stream_aggregations.py —
  * the reference's Kafka/Delta plumbing is infrastructure; the semantics are
  * these three shapes). All are source-agnostic: pass any streaming
  * DataFrame/Dataset (MemoryStream in tests, Kafka/files in production).
  */
object StreamOps {

  /** Watermarked tumbling-window counts/sums per event type. Streaming-safe
    * aggregates only (approx_count_distinct instead of exact distinct). */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
                  windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("events_count"),
        approx_count_distinct("user_id").as("approx_users"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events_count"), col("approx_users"), col("total_value"))

  /** Watermarked SLIDING-window aggregation (reference
    * stream_aggregations.py:30,536 — WindowType.SLIDING): each event lands in
    * len/slide overlapping windows; Spark expands them declaratively, state
    * is bounded by the watermark. */
  def slidingWindowAgg(events: DataFrame, watermark: String = "10 minutes",
                       windowLen: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("events_count"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events_count"), col("total_value"))

  /** Streaming keep-first deduplication by business key within the watermark
    * horizon (reference realtime_silver_processor.py:581-601 — its
    * row_number-over-kafka_timestamp formulation is not executable on an
    * unbounded stream; the Spark-native shape is
    * dropDuplicatesWithinWatermark, whose per-key state expires with the
    * watermark instead of growing forever). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream interval join (reference
    * enhanced_kafka_streams.py:40,52-58 — StreamOperation.JOIN with
    * inner/left/outer JoinType over windows). Spark's native shape: both
    * sides watermarked, an equi-key plus an event-time interval condition —
    * the interval bounds how long each side's state lives, so the join runs
    * unbounded with finite state. `joinType` supports "inner" and
    * "leftOuter" (left-outer emits unmatched rows once the watermark passes
    * the interval). Columns are prefixed to keep both sides' timestamps. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String = "user_id",
                   intervalSeconds: Long = 600,
                   watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("l_key"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $intervalSeconds SECONDS"),
      joinType)
  }

  /** Built-in session windows (gap-based) per user. */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Custom stateful sessionization with flatMapGroupsWithState: sessions
    * close via event-time timeout `gapSeconds` past the last event. State per
    * user is O(1) (a running aggregate, not buffered events). */
  def statefulSessions(events: Dataset[Ev], gapSeconds: Long = 1800,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
              s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { ev =>
              val t = ev.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.nEvents + 1, s.totalValue + ev.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, ev.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, ev.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming curation: the row-local funnel ladder (min-length →
    * repetition → stopword quality → symbol load, `TrainPrep.funnelFlagsOf`)
    * applied to an unbounded document stream. A pure projection — zero
    * state, append mode, works per-microbatch at ingest speed; identical
    * rules (and native text kernels) to the batch funnel, so a doc's keep
    * decision is the same whether it arrives in a crawl stream or a backfill
    * batch. Input needs `doc_id` and `text` columns. */
  def curationStream(docs: DataFrame): DataFrame =
    graft.text.TrainPrep.funnelFlagsOf(docs)
      .select(col("doc_id"), col("k1").as("pass_min_length"),
        col("k2").as("pass_repetition"), col("k3").as("pass_quality"),
        col("k4").as("is_kept"))
}
