package graft

import org.apache.spark.sql.functions._

/** The composed sequence-analytics pipeline (q_events_pipeline): one
  * sessionization — one user-keyed exchange + sort, checkpointed —
  * must feed the per-session rollup, the in-session funnel, and the
  * cohort axes, and each absorbed statistic must agree with an
  * independent recompute. */
class PipelineEventsSpec extends SparkSuite {

  private lazy val rows =
    SparkEntry.queries("q_events_pipeline")(spark, sfDir).collect()

  test("session counts agree with standalone q_events_session") {
    val standalone = SparkEntry.queries("q_events_session")(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length == standalone.size, "one row per user")
    rows.foreach { r =>
      val (nS, nE) = standalone(r.getLong(0))
      assert(r.getLong(1) == nS && r.getLong(2) == nE,
        s"user ${r.getLong(0)}: sessions/events diverge from standalone")
    }
  }

  test("in-session funnel and cohort axes agree with a naive recompute") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.map { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      // gap sessionization replay
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e._4 - sessions.last.last._4 > 1800L * 1000000L)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      val funnel = sessions.count { ss =>
        def m(t: String) = ss.filter(_._3 == t).map(_._4).minOption
        (m("signup"), m("view"), m("purchase")) match {
          case (Some(a), Some(b), Some(c)) => a < b && b < c
          case _ => false
        }
      }
      val weeks = es.map(e =>
        java.time.Instant.ofEpochSecond(e._4 / 1000000L)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
          .`with`(java.time.temporal.TemporalAdjusters
            .previousOrSame(java.time.DayOfWeek.MONDAY))).distinct
      uid -> (sessions.length.toLong, funnel.toLong,
        weeks.min.toString, weeks.size.toLong)
    }
    rows.foreach { r =>
      val (nS, nF, cw, nW) = expected(r.getLong(0))
      assert(r.getLong(1) == nS, s"user ${r.getLong(0)} sessions")
      assert(r.getLong(3) == nF,
        s"user ${r.getLong(0)} funnel sessions: got ${r.getLong(3)}, naive $nF")
      assert(r.getString(4) == cw, s"user ${r.getLong(0)} cohort week")
      assert(r.getLong(5) == nW, s"user ${r.getLong(0)} active weeks")
    }
  }

  test("sessionization runs once: no window, no events re-scan downstream") {
    val p = SparkEntry.queries("q_events_pipeline")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(p.contains("existingrdd"),
      "downstream must read the checkpointed session table")
    assert(!p.contains("window"),
      s"the sessionize window must be materialized once, not replayed:\n$p")
    assert(!p.contains("scan parquet"),
      s"events must not be re-scanned per consumer:\n$p")
    // every surviving exchange moves session/user-grain rows (the
    // per-user rollup and the week distinct); events themselves cross
    // exactly the one shuffle inside the checkpointed stage. Count only
    // SHUFFLE exchange operator lines — a raw "exchange" substring tally
    // also matched ReusedExchange/AQE wrapper nodes and would break on
    // plan-rendering drift (ADVICE r13)
    val exchanges = """(?m)^[\s:+*-]*exchange (hash|range|single)"""
      .r.findAllIn(p).size
    assert(exchanges <= 4,
      s"consumers must aggregate the session table, not re-shuffle " +
        s"events ($exchanges shuffle exchanges):\n$p")
  }
}
