package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.text.TextFunctions

/** Reshaping + sequence-statistics operators: unpivot/melt, deterministic
  * mode, strict-adjacency event-sequence match, IQR anomaly detection,
  * OHLC downsampling, and exact repeated-span (8-gram) deduplication.
  *
  * Reference scope note: UDA's substrate is shuffle+sort+merge only
  * (src/Merger/MergeQueue.h:126-270); every operator here is new engine
  * surface in SURVEY §2.2's "none in reference" rows — melt/mode extend
  * the aggregation category, sequence-match/OHLC the window category,
  * span-dedup the north-star dedup family (the exact-substring
  * complement of MinHash: Lee et al. 2022 showed repeated n-gram spans
  * are what memorization-prone LMs overfit to).
  *
  * Determinism: mode tie-breaks on the smallest value; sequence order is
  * (ms-truncated ts, event_id) in both engines; OHLC groups on raw
  * parquet doubles (exact); span-dedup outputs integer counts and a
  * ratio of integers rounded to 4dp; the IQR fences are computed with
  * the same interpolated-percentile formula in Spark (`percentile`) and
  * DuckDB (`QUANTILE_CONT`), so the fence doubles are bitwise-identical.
  */
object Shape {

  /** ms-truncated event time — identical in Spark and DuckDB. */
  private def tsm: Column = date_trunc("millisecond", col("ts"))

  private def dsum(c: Column) = sum(c.cast(DecimalType(18, 2))).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- unpivot / melt: wide metric columns -> long (metric, value) ----
    // One partial+final aggregate then a zero-shuffle Expand — the
    // reporting-layer reshape. At 100 TB the unpivot multiplies only the
    // already-reduced aggregate, never the fact table.
    "q_unpivot" -> ((s, d) => {
      val agg = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
      agg.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "metric", "value")
    }),

    // ---- deterministic mode: most frequent l_quantity per returnflag ----
    // Spark's built-in `mode` is tie-arbitrary; this composes
    // count + row_number with an explicit (count DESC, value ASC)
    // tie-break so the result is replayable in any engine. Two shuffles
    // on low-cardinality keys; the window partition count is
    // |returnflag| * |distinct qty| — tiny regardless of fact size.
    "q_mode" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("mode_n"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("mode_n").desc, col("l_quantity").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"),
          col("l_quantity").cast("double").as("mode_qty"), col("mode_n"))
    }),

    // ---- strict-adjacency sequence match: view -> view -> purchase ------
    // q_transitions counts adjacent pairs; this matches a 3-step pattern
    // where the steps must be IMMEDIATELY consecutive in the user's
    // stream (two leads over one window sort — a single shuffle on
    // user_id, no self-joins; contrast q_funnel's any-gap ordering).
    "q_seq_match" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(tsm, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("e1", lead(col("event_type"), 1).over(w))
        .withColumn("e2", lead(col("event_type"), 2).over(w))
        .filter(col("event_type") === "view" && col("e1") === "view" &&
          col("e2") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"))
    }),

    // ---- IQR anomaly report: Tukey-fence outliers per event_type -------
    // Robust two-pass outlier detection (the quality gate for metric
    // streams): exact interpolated quartiles per type, fences broadcast
    // back, one scan to count. The broadcast side is |event_type| rows.
    "q_anomaly" -> ((s, d) => {
      val e = Tables.events(s, d)
      val b = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
      val iqr = col("q3") - col("q1")
      e.join(broadcast(b), "event_type")
        .filter(col("value") > col("q3") + iqr * 1.5 ||
          col("value") < col("q1") - iqr * 1.5)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"),
          round(min(col("value")), 2).as("min_val"),
          round(max(col("value")), 2).as("max_val"))
    }),

    // ---- OHLC downsampling: open/high/low/close of value per hour ------
    // The candlestick resample every metrics store runs, as ONE
    // partial+final aggregate (no window sort): open/close are
    // min_by/max_by on a zero-padded (epoch-micros, event_id) string
    // key, so map-side combine reduces each partition to one candidate
    // row per (hour, type) bar before the shuffle — the same plan shape
    // at 100 TB, exchanging only |bars| rows.
    "q_ohlc" -> ((s, d) => {
      val ord = format_string("%020d%010d", unix_micros(tsm), col("event_id"))
      Tables.events(s, d)
        .select(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("h"),
          col("event_type"), ord.as("ord"), col("value"))
        .groupBy(col("h"), col("event_type"))
        .agg(round(min_by(col("value"), col("ord")), 2).as("open"),
          round(max_by(col("value"), col("ord")), 2).as("close"),
          round(min(col("value")), 2).as("low"),
          round(max(col("value")), 2).as("high"), count(lit(1)).as("n"))
    }),

    // ---- moving median: exact 10-row rolling median per user ----------
    // The robust rolling statistic (rolling mean is outlier-poisoned);
    // exact interpolated percentile over a bounded rows frame — work is
    // O(frame) per row, frame is constant, partitions are per-user.
    // Both engines share the interpolation formula, so the doubles are
    // bitwise-identical before rounding.
    "q_window_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(tsm, col("event_id")).rowsBetween(-9, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)").over(w), 3).as("med10"))
    }),

    // ---- exact repeated-span dedup: 8-gram spans shared across docs ----
    // The exact-substring complement of MinHash near-dup: find every
    // 8-token span appearing in >= 2 documents and report, per doc, how
    // much of it is duplicated text. Shingling runs as the native
    // WordShingles expression (distinct per doc by construction); the
    // cross-doc span census is one fingerprint-only groupBy — document
    // payloads never shuffle, only (span, doc_id) pairs, and at 100 TB
    // the span column would be a 64-bit rolling hash instead of the
    // span text (same plan shape, 8x narrower exchange).
    "q_span_dedup" -> ((s, d) => {
      // work-vs-bytes: the 8-gram explosion fans each doc into ~100
      // span rows — widen parallelizes the shingle stage a bytes-split
      // scan serializes (r12 profile: 4.5 s single-task), and the
      // SECOND exchange carries the EXPLODED (doc_id, span) rows so the
      // three consumers of `sh` (the span census, the per-doc dup count
      // and the per-doc total) reuse one materialization instead of
      // re-shingling per branch — the same shape minhashPairs uses
      val slim = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val narrow = Tables.scanIsNarrow(slim)
      val nPart = s.sessionState.conf.numShufflePartitions
      val sh0 = (if (narrow) slim.repartition(nPart, col("doc_id")) else slim)
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 8)).as("span"))
      val sh = if (narrow) sh0.repartition(nPart, col("doc_id")) else sh0
      val dup = sh.groupBy(col("span"))
        .agg(count(lit(1)).as("nd")).filter(col("nd") >= 2)
        .select(col("span"))
      val per = sh.join(dup, "span")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_spans"))
      val tot = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
      tot.join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_spans"),
          coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
          round(coalesce(col("n_dup_spans"), lit(0L)).cast("double") /
            col("n_spans"), 4).as("dup_share"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS DOUBLE) AS n_rows
        |FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM a""".stripMargin,

    "q_mode" ->
      """SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS mode_qty, mode_n
        |FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS mode_n,
        |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |          ORDER BY COUNT(*) DESC, l_quantity ASC) AS rk
        |      FROM lineitem GROUP BY 1, 2)
        |WHERE rk = 1""".stripMargin,

    "q_seq_match" ->
      """SELECT user_id, COUNT(*) AS n_matches
        |FROM (SELECT user_id, event_type,
        |        LEAD(event_type, 1) OVER w AS e1,
        |        LEAD(event_type, 2) OVER w AS e2
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id
        |        ORDER BY DATE_TRUNC('milliseconds', ts), event_id))
        |WHERE event_type = 'view' AND e1 = 'view' AND e2 = 'purchase'
        |GROUP BY user_id""".stripMargin,

    "q_anomaly" ->
      """WITH b AS (SELECT event_type,
        |    QUANTILE_CONT(value, 0.25) AS q1,
        |    QUANTILE_CONT(value, 0.75) AS q3
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS n_outliers,
        |  ROUND(MIN(e.value), 2) AS min_val,
        |  ROUND(MAX(e.value), 2) AS max_val
        |FROM events e JOIN b USING (event_type)
        |WHERE e.value > b.q3 + (b.q3 - b.q1) * 1.5
        |   OR e.value < b.q1 - (b.q3 - b.q1) * 1.5
        |GROUP BY e.event_type""".stripMargin,

    "q_ohlc" ->
      """SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        |  event_type,
        |  ROUND(ARG_MIN(value, ord), 2) AS open,
        |  ROUND(ARG_MAX(value, ord), 2) AS close,
        |  ROUND(MIN(value), 2) AS low, ROUND(MAX(value), 2) AS high,
        |  COUNT(*) AS n
        |FROM (SELECT ts, event_type, value,
        |        LPAD(CAST(EPOCH_US(DATE_TRUNC('milliseconds', ts)) AS VARCHAR), 20, '0')
        |          || LPAD(CAST(event_id AS VARCHAR), 10, '0') AS ord
        |      FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "q_window_median" ->
      """SELECT user_id, event_id,
        |  ROUND(QUANTILE_CONT(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY DATE_TRUNC('milliseconds', ts), event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 3) AS med10
        |FROM events""".stripMargin,

    "q_span_dedup" ->
      """WITH sh AS (SELECT DISTINCT doc_id, span FROM (
        |    SELECT doc_id,
        |      UNNEST([ARRAY_TO_STRING(ts[i:i+7], ' ') FOR i IN RANGE(1, LEN(ts)-6)]) AS span
        |    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents)
        |    WHERE LEN(ts) >= 8)),
        |dup AS (SELECT span FROM sh GROUP BY span HAVING COUNT(*) >= 2),
        |per AS (SELECT s.doc_id, COUNT(*) AS n_dup_spans
        |        FROM sh s JOIN dup USING (span) GROUP BY 1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY 1)
        |SELECT t.doc_id, t.n_spans,
        |  COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
        |  ROUND(CAST(COALESCE(p.n_dup_spans, 0) AS DOUBLE) / t.n_spans, 4)
        |    AS dup_share
        |FROM tot t LEFT JOIN per p USING (doc_id)""".stripMargin
  )
}
