package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.{AsOfJoin, Sessionize}

/** Event-stream operators in their batch-parity form (the same logical
  * plans [[graft.streaming.EventsStreaming]] runs incrementally):
  * tumbling/sliding windows, gap sessionization, as-of join.
  * Window labels are emitted as formatted strings so the DuckDB compare
  * never sees raw timestamps (the fixture's nanosecond precision doesn't
  * survive Spark's microsecond timestamps).
  */
object EventsOps {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1h windows — streaming's groupBy(window(...)) in batch
    "q_events_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"), col("sum_value"))),

    // sliding 1h windows every 30min (each event counted in 2 windows)
    "q_events_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"))),

    // time-series downsampling: truncate to the minute + aggregate —
    // the resample step every metrics/telemetry pipeline runs; one
    // partial+final aggregate, no window machinery needed
    "q_events_resample" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("minute", col("ts")).as("minute"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("m"),
          col("event_type"), col("n"), col("sum_value"))),

    // gap sessionization (30 min) + per-session aggregates
    "q_events_session" -> ((s, d) => {
      val sess = Sessionize.sessionize(Tables.events(s, d),
        "user_id", "ts", "event_id", gapSeconds = 1800L)
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"))
    }),

    // forward as-of: each purchase matched to the user's EARLIEST
    // signup at or after the purchase time (next-event lookup)
    "q_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOfJoin.asofForward(purchases, signups, Seq("user_id"),
          "ts", "ts", Seq("event_id"), tiebreak = Some("event_id"))
        .select(col("event_id").as("purchase_id"),
          col("__match.event_id").as("next_signup_id"))
    }),

    // as-of join: each purchase matched to the user's latest signup at
    // or before the purchase time
    "q_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOfJoin.asofBackward(purchases, signups, Seq("user_id"),
          "ts", "ts", Seq("event_id"), tiebreak = Some("event_id"))
        .select(col("event_id").as("purchase_id"),
          col("__match.event_id").as("signup_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_events_resample" ->
      """SELECT STRFTIME(DATE_TRUNC('minute', ts), '%Y-%m-%d %H:%M:%S') AS m,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_window" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_events_sliding" ->
      """WITH x AS (SELECT event_type,
        |    TIME_BUCKET(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b
        |  FROM events),
        |w AS (SELECT event_type, b AS ws FROM x
        |      UNION ALL
        |      SELECT event_type, b - INTERVAL '30 minutes' AS ws FROM x)
        |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
        |  COUNT(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_events_session" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS uts FROM events),
        |l AS (SELECT *, LAG(uts) OVER (PARTITION BY user_id
        |        ORDER BY uts, event_id) AS prev FROM o),
        |n AS (SELECT *, CASE WHEN prev IS NULL
        |        OR uts - prev > INTERVAL '30 minutes' THEN 1 ELSE 0 END
        |        AS is_new FROM l),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |        ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM n)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_purchases
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_asof_forward" ->
      """SELECT l.event_id AS purchase_id, r.event_id AS next_signup_id
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |      FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |      FROM events WHERE event_type = 'signup') r
        |ON l.user_id = r.user_id AND l.uts <= r.uts""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id AS purchase_id, r.event_id AS signup_id
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |      FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |      FROM events WHERE event_type = 'signup') r
        |ON l.user_id = r.user_id AND l.uts >= r.uts""".stripMargin
  )
}
