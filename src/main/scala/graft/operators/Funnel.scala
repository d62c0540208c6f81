package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion funnel + marketing attribution over the events stream —
  * the two canonical product-analytics operators the reference's event
  * pipeline (windowed aggs + sessionization) stops short of.
  *
  * Reference anchor: `src/streaming/event_processor` computes windowed
  * counts and gap sessions; funnels and attribution are the standard
  * next layer every product-analytics warehouse (Amplitude/GA-class)
  * builds on the same event schema.
  *
  * FUNNEL (view → click → signup → purchase, strictly-ordered): a user
  * converts step k only with an event of type k strictly AFTER their
  * step-(k−1) conversion time. The classic cascading-window form: ONE
  * shuffle (user-partitioned, (ts, event_id)-ordered) carries all four
  * steps — step k's qualifying time is a running min over a window that
  * reuses the same partitioning and sort, so Catalyst plans one Exchange
  * + one Sort for the whole cascade (verified in PlanSpec). No joins, no
  * per-step re-scan of the events table.
  *
  * ATTRIBUTION (last-touch / first-touch / linear over a 7-day lookback):
  * purchases join prior view/click touches of the same user; per
  * conversion, rank touches both directions and split linear credit in
  * integer ppm (1000000 // n — floor division, both engines). The join
  * shuffles on user_id — bounded per-user fan-out (conversions × touches
  * within the window); heavy-hitter users are the events_sessions skew
  * story and the same salting applies. Conversions with no touch in the
  * window surface as the 'direct' channel so credit always sums to the
  * conversion count.
  *
  * Both outputs are integer counts / ppm — hash-gated. */
object Funnel {

  private val Steps = Seq("view", "click", "signup", "purchase")

  /** 4-row funnel summary: (step, step_name, users, conv_from_first_ppm,
    * conv_from_prev_ppm, total_lag_seconds). `users` counts users whose
    * ordered prefix reaches the step; lag sums the seconds between the
    * user's step-(k−1) and step-k conversion times. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin(Steps: _*))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cascading windows: q_k = this row qualifies as step k; r_k = earliest
    // qualifying step-k time seen so far (same window spec every step →
    // one Exchange + one Sort total)
    val x1 = ev.withColumn("__r1",
      min(when(col("event_type") === "view", col("ts"))).over(w))
    val x2 = x1
      .withColumn("__q2",
        when(col("event_type") === "click" && col("ts") > col("__r1"), col("ts")))
      .withColumn("__r2", min(col("__q2")).over(w))
    val x3 = x2
      .withColumn("__q3",
        when(col("event_type") === "signup" && col("ts") > col("__r2"), col("ts")))
      .withColumn("__r3", min(col("__q3")).over(w))
    val x4 = x3
      .withColumn("__q4",
        when(col("event_type") === "purchase" && col("ts") > col("__r3"), col("ts")))
    val u = x4.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("ts"))).as("t1"),
      min(col("__q2")).as("t2"),
      min(col("__q3")).as("t3"),
      min(col("__q4")).as("t4"))
    summarizeSteps(u)
  }

  /** The 4-row summary stage over a per-user (t1..t4) step-time frame —
    * shared by the batch cascade and the streaming state replay
    * ([[graft.streaming.StreamingFunnel]]), so both emit bit-identical
    * summaries for equal state. */
  private[graft] def summarizeSteps(u: DataFrame): DataFrame = {
    def lagSum(a: String, b: String) = coalesce(sum(
      when(col(b).isNotNull,
        unix_timestamp(col(b)) - unix_timestamp(col(a)))), lit(0L))
    val tot = u.agg(
      count(col("t1")).as("u1"), count(col("t2")).as("u2"),
      count(col("t3")).as("u3"), count(col("t4")).as("u4"),
      lagSum("t1", "t2").as("lag2"), lagSum("t2", "t3").as("lag3"),
      lagSum("t3", "t4").as("lag4"))
    val rows = Steps.zipWithIndex.map { case (name, i) =>
      val k = i + 1
      struct(lit(k.toLong).as("step"), lit(name).as("step_name"),
        col(s"u$k").as("users"),
        (if (k == 1) lit(0L) else col(s"lag$k")).as("total_lag_seconds"),
        (if (k == 1) lit(1000000L)
         else expr(s"CASE WHEN u1 = 0 THEN 0L ELSE (u$k * 1000000) div u1 END"))
          .as("conv_from_first_ppm"),
        (if (k == 1) lit(1000000L)
         else expr(s"CASE WHEN u${k - 1} = 0 THEN 0L ELSE (u$k * 1000000) div u${k - 1} END"))
          .as("conv_from_prev_ppm"))
    }
    tot.select(explode(array(rows: _*)).as("s"))
      .select(col("s.step"), col("s.step_name"), col("s.users"),
        col("s.conv_from_first_ppm"), col("s.conv_from_prev_ppm"),
        col("s.total_lag_seconds"))
      .orderBy("step")
  }

  def eventFunnelOracle: String = {
    val winDef = "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)"
    s"""WITH f AS (
       |  SELECT user_id, event_id, event_type, ts FROM events
       |  WHERE event_type IN ('view','click','signup','purchase')
       |), x1 AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS r1
       |  FROM f WINDOW w AS $winDef
       |), x2 AS (
       |  SELECT *, CASE WHEN event_type = 'click' AND ts > r1 THEN ts END AS q2,
       |    MIN(CASE WHEN event_type = 'click' AND ts > r1 THEN ts END) OVER w AS r2
       |  FROM x1 WINDOW w AS $winDef
       |), x3 AS (
       |  SELECT *, CASE WHEN event_type = 'signup' AND ts > r2 THEN ts END AS q3,
       |    MIN(CASE WHEN event_type = 'signup' AND ts > r2 THEN ts END) OVER w AS r3
       |  FROM x2 WINDOW w AS $winDef
       |), x4 AS (
       |  SELECT *, CASE WHEN event_type = 'purchase' AND ts > r3 THEN ts END AS q4
       |  FROM x3 WINDOW w AS $winDef
       |), u AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
       |    MIN(q2) AS t2, MIN(q3) AS t3, MIN(q4) AS t4
       |  FROM x4 GROUP BY 1
       |), tot AS (
       |  SELECT COUNT(t1) AS u1, COUNT(t2) AS u2, COUNT(t3) AS u3, COUNT(t4) AS u4,
       |    COALESCE(SUM(CASE WHEN t2 IS NOT NULL THEN date_diff('second', t1, t2) END), 0) AS lag2,
       |    COALESCE(SUM(CASE WHEN t3 IS NOT NULL THEN date_diff('second', t2, t3) END), 0) AS lag3,
       |    COALESCE(SUM(CASE WHEN t4 IS NOT NULL THEN date_diff('second', t3, t4) END), 0) AS lag4
       |  FROM u
       |)
       |SELECT step, step_name, users, conv_from_first_ppm, conv_from_prev_ppm,
       |  CAST(total_lag_seconds AS BIGINT) AS total_lag_seconds
       |FROM (
       |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, u1 AS users,
       |    CAST(0 AS BIGINT) AS total_lag_seconds,
       |    CAST(1000000 AS BIGINT) AS conv_from_first_ppm,
       |    CAST(1000000 AS BIGINT) AS conv_from_prev_ppm FROM tot
       |  UNION ALL
       |  SELECT 2, 'click', u2, lag2,
       |    CASE WHEN u1 = 0 THEN 0 ELSE (u2 * 1000000) // u1 END,
       |    CASE WHEN u1 = 0 THEN 0 ELSE (u2 * 1000000) // u1 END FROM tot
       |  UNION ALL
       |  SELECT 3, 'signup', u3, lag3,
       |    CASE WHEN u1 = 0 THEN 0 ELSE (u3 * 1000000) // u1 END,
       |    CASE WHEN u2 = 0 THEN 0 ELSE (u3 * 1000000) // u2 END FROM tot
       |  UNION ALL
       |  SELECT 4, 'purchase', u4, lag4,
       |    CASE WHEN u1 = 0 THEN 0 ELSE (u4 * 1000000) // u1 END,
       |    CASE WHEN u3 = 0 THEN 0 ELSE (u4 * 1000000) // u3 END FROM tot
       |)
       |ORDER BY step""".stripMargin
  }

  /** Per-channel attribution: (channel, last_touch, first_touch,
    * linear_credit_ppm, n_touches). Touches = view/click strictly before
    * the purchase within 7 days; `direct` rows carry conversions with no
    * touch in the window. Credit conservation: Σ last_touch =
    * Σ first_touch = Σ linear/10^6-ish = total conversions (linear floors
    * per touch, so its total can trail by < n per conversion). */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("ts").as("cts"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts"))
    val j = conv.join(touch, "user_id")
      .filter(col("ts") < col("cts") &&
        col("ts") >= col("cts") - expr("INTERVAL 7 DAY"))
    val wc = Window.partitionBy(col("conv_id"))
    val wLast = wc.orderBy(col("ts").desc, col("touch_id").desc)
    val wFirst = wc.orderBy(col("ts").asc, col("touch_id").asc)
    val ranked = j
      .withColumn("n", count(lit(1)).over(wc))
      .withColumn("rlast", row_number().over(wLast))
      .withColumn("rfirst", row_number().over(wFirst))
    val perChannel = ranked.groupBy("channel").agg(
      sum(when(col("rlast") === 1, 1L).otherwise(0L)).as("last_touch"),
      sum(when(col("rfirst") === 1, 1L).otherwise(0L)).as("first_touch"),
      sum(expr("1000000 div n")).as("linear_credit_ppm"),
      count(lit(1)).as("n_touches"))
    val direct = conv.join(
        j.select(col("conv_id")).distinct(), Seq("conv_id"), "left_anti")
      .agg(count(lit(1)).as("d"))
      .select(lit("direct").as("channel"), col("d").as("last_touch"),
        col("d").as("first_touch"), (col("d") * 1000000L).as("linear_credit_ppm"),
        lit(0L).as("n_touches"))
    perChannel.unionByName(direct).orderBy("channel")
  }

  def attributionOracle: String =
    """WITH c AS (
      |  SELECT user_id, event_id AS conv_id, ts AS cts FROM events
      |  WHERE event_type = 'purchase'
      |), t AS (
      |  SELECT user_id, event_id AS touch_id, event_type AS channel, ts FROM events
      |  WHERE event_type IN ('view','click')
      |), j AS (
      |  SELECT c.conv_id, t.touch_id, t.channel, t.ts
      |  FROM c JOIN t ON c.user_id = t.user_id
      |    AND t.ts < c.cts AND t.ts >= c.cts - INTERVAL 7 DAY
      |), w AS (
      |  SELECT *,
      |    COUNT(*) OVER (PARTITION BY conv_id) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts DESC, touch_id DESC) AS rlast,
      |    ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts ASC, touch_id ASC) AS rfirst
      |  FROM j
      |), ch AS (
      |  SELECT channel,
      |    CAST(SUM(CASE WHEN rlast = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
      |    CAST(SUM(CASE WHEN rfirst = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
      |    CAST(SUM(1000000 // n) AS BIGINT) AS linear_credit_ppm,
      |    COUNT(*) AS n_touches
      |  FROM w GROUP BY 1
      |), d AS (
      |  SELECT COUNT(*) AS nd FROM c
      |  WHERE conv_id NOT IN (SELECT conv_id FROM j)
      |)
      |SELECT * FROM (
      |  SELECT channel, last_touch, first_touch, linear_credit_ppm, n_touches FROM ch
      |  UNION ALL
      |  SELECT 'direct', nd, nd, nd * 1000000, CAST(0 AS BIGINT) FROM d
      |)
      |ORDER BY channel""".stripMargin
}
