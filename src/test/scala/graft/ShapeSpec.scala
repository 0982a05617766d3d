package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the Shape module (unpivot, deterministic mode,
  * strict-adjacency sequence match, IQR anomaly, OHLC, repeated-span
  * dedup). Value-level correctness is the DuckDB oracle's job; these
  * assert internal consistency and the at-scale plan shapes. */
class ShapeSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("unpivot triples the aggregate row count and loses no mass") {
    val wide = Tables.lineitem(spark, sfDir)
      .select("l_returnflag").distinct().count()
    val long = q("q_unpivot")
    assert(long.count() == wide * 3)
    // n_rows metric must sum back to the fact-table row count
    val n = long.filter(col("metric") === "n_rows")
      .agg(sum("value")).collect().head.getDouble(0)
    assert(n == Tables.lineitem(spark, sfDir).count().toDouble)
  }

  test("mode is the max-count value with smallest-value tie-break") {
    val li = Tables.lineitem(spark, sfDir)
    val modes = q("q_mode").collect()
    assert(modes.nonEmpty)
    modes.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val counts = li.filter(col("l_returnflag") === flag)
        .groupBy("l_quantity").count().collect()
        .map(x => (x.getAs[Any](0).toString.toDouble, x.getLong(1)))
      val maxN = counts.map(_._2).max
      val expected = counts.filter(_._2 == maxN).map(_._1).min
      assert(r.getAs[Double]("mode_qty") == expected)
      assert(r.getAs[Long]("mode_n") == maxN)
    }
  }

  test("seq_match counts never exceed the user's purchase count") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").count()
    val bad = q("q_seq_match")
      .join(purchases, "user_id")
      .filter(col("n_matches") > col("count"))
    assert(bad.count() == 0)
  }

  test("anomaly outliers lie outside the Tukey fences") {
    // every reported min/max must be a genuine extreme of its type
    val rows = q("q_anomaly").collect()
    val stats = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (q1, q3) = stats(r.getAs[String]("event_type"))
      val iqr = q3 - q1
      val hi = q3 + 1.5 * iqr
      val lo = q1 - 1.5 * iqr
      val mx = r.getAs[Double]("max_val")
      val mn = r.getAs[Double]("min_val")
      // rounded to 2dp, so compare with slack
      assert(mx > hi - 0.01 || mn < lo + 0.01,
        s"reported outlier range [$mn,$mx] inside fences [$lo,$hi]")
    }
  }

  test("ohlc: low <= open,close <= high and bars partition the events") {
    val bars = q("q_ohlc").cache()
    try {
      val bad = bars.filter(col("low") > col("open") ||
        col("low") > col("close") || col("high") < col("open") ||
        col("high") < col("close"))
      assert(bad.count() == 0)
      val total = bars.agg(sum("n")).collect().head.getLong(0)
      assert(total == Tables.events(spark, sfDir).count())
    } finally bars.unpersist()
  }

  test("span_dedup: shares in [0,1]; a planted duplicate pair is caught") {
    import spark.implicits._
    val r = q("q_span_dedup")
    assert(r.filter(col("dup_share") < 0 || col("dup_share") > 1).count() == 0)
    // planted corpus: two docs share an 8-token span, one is unique
    val docs = Seq(
      (1L, "a b c d e f g h unique tail one"),
      (2L, "prefix two a b c d e f g h"),
      (3L, "totally different words with no shared span at all ok")
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(graft.text.TextFunctions.shingles(col("text"), 8)).as("span"))
    val dup = sh.groupBy("span").count().filter(col("count") >= 2)
    val hits = sh.join(dup.select("span"), "span")
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(hits.toSeq == Seq(1L, 2L))
  }

  test("ohlc is a pure aggregate: no window operator in the plan") {
    val plan = q("q_ohlc").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "OHLC must not plan a window sort")
  }

  test("window_median equals a driver-side rolling median for one user") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") === 1L)
      .select("event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .sortBy(t => (t._2, t._1))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val expected = ev.indices.map { i =>
      val frame = ev.slice(math.max(0, i - 9), i + 1).map(_._3)
      ev(i)._1 -> math.floor(median(frame.toIndexedSeq) * 1000 + 0.5) / 1000
    }.toMap
    val got = q("q_window_median").filter(col("user_id") === 1L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, m) =>
      assert(math.abs(got(id) - m) < 1e-9, s"event $id: ${got(id)} != $m")
    }
  }

  test("span_dedup plan shuffles only (span, doc_id) pairs, never text") {
    val plan = q("q_span_dedup").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(text"),
      "document payload must not be a shuffle key")
  }
}
