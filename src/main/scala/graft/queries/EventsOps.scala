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

    // ---- COMPOSED sequence-analytics pipeline (r12 VERDICT stretch 6):
    // the q_dedup_pipeline move applied to the events side. A real
    // product-analytics run sessionizes ONCE, materializes the
    // SESSION-GRAIN table, and derives every report from it; the
    // standalones (q_events_session, q_funnel, q_cohort) each re-scan
    // and re-sort events in per-query isolation. Here the events scan,
    // the sessionize window (the one user-keyed exchange + sort) and
    // the rollup to session grain all run in ONE stage — the window's
    // hash(user_id) clustering already satisfies the (user, session)
    // groupBy, so the rollup adds no exchange — and the resulting
    // session table (one slim row per session: counts, funnel-step min
    // times, first ts, the session's distinct event weeks) is
    // checkpointed once. Three consumer families read it: per-user
    // session stats, an in-session funnel (strictly ordered signup <
    // view < purchase WITHIN one session — stricter than q_funnel's
    // lifetime funnel), and the cohort axes (first-activity week,
    // distinct active weeks). Downstream exchanges carry only
    // session/user-grain rows — events cross exactly one shuffle no
    // matter how many reports compose. PipelineEventsSpec pins the
    // shape: no Window, no events re-scan downstream of the
    // checkpoint. One row per user.
    "q_events_pipeline" -> ((s, d) => {
      val sess = Sessionize.sessionize(Tables.events(s, d),
        "user_id", "ts", "event_id", gapSeconds = 1800L)
      val perSession = sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_ev"),
          min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("t_purchase"),
          min(col("ts")).as("t_first"),
          collect_set(date_trunc("week", col("ts"))).as("wks"))
        .localCheckpoint()
      val perUser = perSession.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          count(when(col("t_signup") < col("t_view") &&
            col("t_view") < col("t_purchase"), lit(1)))
            .as("n_funnel_sessions"),
          date_format(date_trunc("week", min(col("t_first"))), "yyyy-MM-dd")
            .as("cohort_week"))
      // a session's distinct weeks (a 1-2 element set) explode to at
      // most sessions+1 rows per user — session grain, never event grain
      val activeWeeks = perSession
        .select(col("user_id"), explode(col("wks")).as("wk")).distinct()
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_active_weeks"))
      perUser.join(activeWeeks, "user_id")
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          col("n_funnel_sessions"), col("cohort_week"), col("n_active_weeks"))
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
    }),

    // time-weighted average: each reading holds until the user's next
    // event, so its weight is that duration in seconds (the last reading
    // of a series has no horizon and is excluded) — the correct mean for
    // irregularly-sampled telemetry, where a plain avg over-weights
    // bursts. One partitioned window (lead), then decimal-exact
    // sum(v·w)/sum(w) per user, divided once as doubles.
    "q_time_weighted_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("_next", lead(col("ts"), 1).over(w))
        .filter(col("_next").isNotNull)
        .withColumn("_w",
          ((unix_micros(col("_next")) - unix_micros(col("ts"))) / 1000000L)
            .cast("decimal(19,6)"))
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(12,6)") * col("_w"))
            .as("_num"),
          sum(col("_w")).as("_den"), count(lit(1)).as("n_intervals"))
        .select(col("user_id"), col("n_intervals"),
          round(col("_num").cast("double") / col("_den").cast("double"), 6)
            .as("twa_value"))
    }),

    // rolling active users: DISTINCT users per sliding 1-hour window
    // every 20 min (the DAU/rolling-active metric). Each event lands in
    // exactly 3 windows — a bounded 3× expansion, then partial distinct
    // map-side before the one exchange on (window, user); never a
    // per-window scan of history.
    "q_sliding_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "20 minutes"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("ws"), col("n_users"))),

    // nearest as-of: each purchase matched to the user's signup CLOSEST
    // in time, either direction (ties -> the earlier one) — the
    // attribution variant when cause/effect direction is unknown
    "q_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOfJoin.asofNearest(purchases, signups, Seq("user_id"),
          "ts", "ts", Seq("event_id"), tiebreak = Some("event_id"))
        .select(col("event_id").as("purchase_id"),
          col("__match.event_id").as("nearest_signup_id"))
    }),

    // sweep-line interval concurrency: each event opens a deterministic
    // [ts, ts + 300 + event_id % 3600 sec) activity interval; emit the
    // per-hour MAX number of simultaneously open intervals. +1/-1 change
    // points -> net delta per instant (partial+final aggregate) -> global
    // running sum via the two-phase distributed prefix scan (the only
    // SinglePartition is over ~one row per hour bucket) -> per-hour max.
    // Zero-delta SENTINEL rows at every hour boundary in the data's time
    // range make the carry-in visible: an hour whose deltas only
    // decrease still reports the concurrency it inherited at its start,
    // and hours with no change points emit rows instead of vanishing.
    // Sentinel count is bounded by the TIME RANGE (one per hour), never
    // by data size. The classic "peak concurrent sessions" query, with
    // no interval self-join and no row explosion: 2 rows per event plus
    // one per hour, ever.
    "q_concurrency" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        unix_micros(col("ts")).as("st"),
        (lit(300L) + col("event_id") % 3600L).as("dur"))
      val deltas = ev.select(col("st").as("t"), lit(1L).as("d"))
        .unionByName(ev.select((col("st") + col("dur") * 1000000L).as("t"),
          lit(-1L).as("d")))
      val sentinels = deltas
        .agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
        .select(explode(sequence(expr("lo DIV 3600000000"),
          expr("hi DIV 3600000000"))).as("h"))
        .select((col("h") * 3600000000L).as("t"), lit(0L).as("d"))
      val net = deltas.unionByName(sentinels)
        .groupBy(col("t")).agg(sum(col("d")).as("net"))
      graft.operators.Prefix.runningSum(net,
          expr("t DIV 3600000000"), Seq(col("t")), col("net"), "conc")
        .groupBy(expr("t DIV 3600000000").as("hour_id"))
        .agg(max(col("conc")).as("max_conc"))
    }),

    // exact decayed moving average (EWMA over the trailing 9 events per
    // user, decay 0.9): weights are the RATIONALS 9^d·10^(8-d) (exact in
    // both engines — no libm pow drift can flip a digit), accumulated in
    // decimals so the sum is order-independent, divided once as doubles.
    // One user-partitioned window; the weighted sum is a codegen'd
    // higher-order function over the frame list — map-side after the
    // window sort, no self-join, no row explosion.
    "q_ewma" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-8, 0)
      def wInt(dd: org.apache.spark.sql.Column) =
        (pow(lit(9.0), dd.cast("double")) *
          pow(lit(10.0), lit(8.0) - dd.cast("double"))).cast("decimal(12,0)")
      Tables.events(s, d)
        .withColumn("_vals",
          collect_list(col("value").cast("decimal(18,6)")).over(w))
        .withColumn("_dists",
          sequence(size(col("_vals")) - 1, lit(0), lit(-1)))
        .withColumn("_num", aggregate(
          zip_with(col("_vals"), col("_dists"), (v, dd) => v * wInt(dd)),
          lit(0).cast("decimal(32,6)"),
          (acc, x) => (acc + x).cast("decimal(32,6)")))
        .withColumn("_den", aggregate(col("_dists"),
          lit(0).cast("decimal(14,0)"),
          (acc, dd) => (acc + wInt(dd)).cast("decimal(14,0)")))
        .select(col("user_id"), col("event_id"),
          round(col("_num").cast("double") / col("_den").cast("double"), 6)
            .as("ewma9"))
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

    // replay the 30-min gap sessionization once (the q_events_session
    // CTE chain), then derive all three report families from that one
    // session relation — mirroring the Spark plan's single checkpoint
    "q_events_pipeline" ->
      """WITH o AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS uts FROM events),
        |l AS (SELECT *, LAG(uts) OVER (PARTITION BY user_id
        |        ORDER BY uts, event_id) AS prev FROM o),
        |n AS (SELECT *, CASE WHEN prev IS NULL
        |        OR uts - prev > INTERVAL '30 minutes' THEN 1 ELSE 0 END
        |        AS is_new FROM l),
        |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |        ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM n),
        |ps AS (SELECT user_id, sid, COUNT(*) AS n_ev,
        |         MIN(CASE WHEN event_type = 'signup' THEN uts END) AS t_signup,
        |         MIN(CASE WHEN event_type = 'view' THEN uts END) AS t_view,
        |         MIN(CASE WHEN event_type = 'purchase' THEN uts END) AS t_purchase
        |       FROM s GROUP BY 1, 2),
        |pu AS (SELECT user_id, COUNT(*) AS n_sessions,
        |         CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |         COUNT(*) FILTER (WHERE t_signup < t_view
        |           AND t_view < t_purchase) AS n_funnel_sessions
        |       FROM ps GROUP BY 1),
        |cw AS (SELECT user_id,
        |         STRFTIME(DATE_TRUNC('week', MIN(uts)), '%Y-%m-%d') AS cohort_week
        |       FROM s GROUP BY 1),
        |aw AS (SELECT user_id, COUNT(*) AS n_active_weeks
        |       FROM (SELECT DISTINCT user_id, DATE_TRUNC('week', uts) AS wk
        |             FROM s) GROUP BY 1)
        |SELECT pu.user_id, pu.n_sessions, pu.n_events, pu.n_funnel_sessions,
        |  cw.cohort_week, aw.n_active_weeks
        |FROM pu JOIN cw USING (user_id) JOIN aw USING (user_id)""".stripMargin,

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
        |ON l.user_id = r.user_id AND l.uts >= r.uts""".stripMargin,

    "q_time_weighted_avg" ->
      """WITH o AS (SELECT user_id, event_id, value,
        |    CAST(ts AS TIMESTAMP) AS uts FROM events),
        |l AS (SELECT user_id, value,
        |    CAST((epoch_us(LEAD(uts) OVER (PARTITION BY user_id
        |        ORDER BY uts, event_id)) - epoch_us(uts)) / 1000000
        |      AS DECIMAL(19,6)) AS w
        |  FROM o)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(12,6)) * w) AS DOUBLE)
        |        / CAST(SUM(w) AS DOUBLE), 6) AS twa_value
        |FROM l WHERE w IS NOT NULL GROUP BY user_id""".stripMargin,

    "q_sliding_distinct" ->
      """WITH x AS (SELECT user_id,
        |    TIME_BUCKET(INTERVAL '20 minutes', CAST(ts AS TIMESTAMP)) AS b
        |  FROM events),
        |w AS (SELECT user_id, b AS ws FROM x
        |      UNION ALL SELECT user_id, b - INTERVAL '20 minutes' FROM x
        |      UNION ALL SELECT user_id, b - INTERVAL '40 minutes' FROM x)
        |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS ws,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM w GROUP BY 1""".stripMargin,

    "q_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |           FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS uts
        |      FROM events WHERE event_type = 'signup'),
        |b AS (SELECT l.event_id AS pid, r.event_id AS bid,
        |        l.uts - r.uts AS db
        |      FROM p l ASOF LEFT JOIN s r
        |        ON l.user_id = r.user_id AND l.uts >= r.uts),
        |f AS (SELECT l.event_id AS pid, r.event_id AS fid,
        |        r.uts - l.uts AS df
        |      FROM p l ASOF LEFT JOIN s r
        |        ON l.user_id = r.user_id AND l.uts <= r.uts)
        |SELECT b.pid AS purchase_id,
        |  CASE WHEN b.bid IS NULL THEN f.fid
        |       WHEN f.fid IS NULL THEN b.bid
        |       WHEN b.db <= f.df THEN b.bid ELSE f.fid END
        |    AS nearest_signup_id
        |FROM b JOIN f ON b.pid = f.pid""".stripMargin,

    "q_concurrency" ->
      """WITH ev AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS st,
        |    300 + event_id % 3600 AS dur FROM events),
        |d AS (SELECT st AS t, 1 AS d FROM ev
        |      UNION ALL SELECT st + dur * 1000000, -1 FROM ev),
        |b AS (SELECT MIN(t) // 3600000000 AS lo,
        |             MAX(t) // 3600000000 AS hi FROM d),
        |s AS (SELECT UNNEST(generate_series(lo, hi)) * 3600000000 AS t,
        |             0 AS d FROM b),
        |g AS (SELECT t, CAST(SUM(d) AS BIGINT) AS net
        |      FROM (SELECT * FROM d UNION ALL SELECT * FROM s) GROUP BY t),
        |r AS (SELECT t, CAST(SUM(net) OVER (ORDER BY t
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM g)
        |SELECT t // 3600000000 AS hour_id, MAX(conc) AS max_conc
        |FROM r GROUP BY 1""".stripMargin,

    "q_ewma" ->
      """WITH o AS (SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id,
        |  ROUND(CAST(SUM(CAST(b.value AS DECIMAL(18,6)) *
        |      CAST(POWER(9, a.rn - b.rn) * POWER(10, 8 - (a.rn - b.rn))
        |           AS DECIMAL(12,0))) AS DOUBLE)
        |    / CAST(SUM(CAST(POWER(9, a.rn - b.rn) *
        |        POWER(10, 8 - (a.rn - b.rn)) AS DECIMAL(12,0))) AS DOUBLE),
        |    6) AS ewma9
        |FROM o a JOIN o b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 8 AND a.rn
        |GROUP BY a.user_id, a.event_id""".stripMargin
  )
}
