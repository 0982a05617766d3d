package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed global prefix scan (operators.Prefix) vs the built-in
  * single-partition window, plus the plan shape that makes it scale. */
class PrefixSpec extends SparkSuite {

  test("q_running_global equals the built-in unpartitioned window") {
    val got = SparkEntry.queries("q_running_global")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    val w = Window
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = Tables.lineitem(spark, sfDir)
      .withColumn("running_qty",
        sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    assert(got.length == want.length)
    assert(got.sorted.sameElements(want.sorted),
      "prefix-scan result differs from single-partition window reference")
  }

  test("runningMax (inclusive and strict) equals the unpartitioned window") {
    import spark.implicits._
    // values deliberately non-monotone so the running max changes hands
    // across bucket boundaries; 1-row buckets at the tail exercise the
    // empty-strict-frame -> carry-only path
    val df = (1L to 3001L).map(i => (i, (i * 7919) % 1000)).toDF("k", "v")

    val wIncl = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wStrict = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)

    val wantIncl = df.withColumn("m", max(col("v")).over(wIncl))
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    val wantStrict = df.withColumn("m", max(col("v")).over(wStrict))
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap

    val gotIncl = graft.operators.Prefix.runningMax(df,
        (col("k") / 500).cast("long"), Seq(col("k")), col("v"), "m")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    val gotStrict = graft.operators.Prefix.runningMax(df,
        (col("k") / 500).cast("long"), Seq(col("k")), col("v"), "m",
        inclusive = false)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap

    assert(gotIncl == wantIncl)
    assert(gotStrict == wantStrict)
    assert(gotStrict(1L).isEmpty) // nothing strictly precedes the first row
  }

  test("fillForward equals the built-in unpartitioned last(ignoreNulls) window") {
    import spark.implicits._
    // synthetic sparse series: leading nulls (no carry available), an
    // all-null bucket span, and null runs crossing bucket boundaries
    val rows = (1L to 5000L).map { i =>
      val v = if (i < 10 || (i % 7 != 0) || (i > 2000 && i < 2600))
        None else Some(i * 1.5)
      (i, v)
    }
    val df = rows.toDF("k", "v")
    val got = graft.operators.Prefix.fillForward(df,
        bucket = (col("k") / 500).cast("long"),
        order = Seq(col("k")), value = "v", out = "filled")
      .select(col("k"), col("filled"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("k"), col("filled"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got.size == want.size)
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"k=$k: expected $v got ${got(k)}") }
  }

  test("q_gap_fill: spine never passes through a SinglePartition exchange") {
    val plan = SparkEntry.queries("q_gap_fill")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // same contract as the running-sum scan: the only SinglePartition
    // stages are over per-bucket aggregates (one row per 1024 minutes) or
    // the 1-row min/max bounds — never the spine itself. The spine-side
    // fill window must be bucket-partitioned and carries broadcast back.
    assert(plan.contains("windowspecdefinition(_gbucket"),
      s"spine fill window not bucket-partitioned:\n$plan")
    // an unpartitioned window over the spine would print its spec as
    // windowspecdefinition(minute#N ASC ... (minute as the FIRST argument);
    // the bucket-partitioned fill has _gbucket first, minute second
    assert(!plan.contains("windowspecdefinition(minute#"),
      s"unpartitioned window over the spine remains:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"carries not broadcast:\n$plan")
  }

  test("prefix scan: fact table never passes through a SinglePartition exchange") {
    val plan = SparkEntry.queries("q_running_global")(spark, sfDir)
      .queryExecution.executedPlan.toString

    // The only SinglePartition allowed is the exclusive prefix over the
    // per-bucket totals (rows = #buckets, KB-scale). That branch sits under
    // a HashAggregate; the fact-side window must be partitioned on _gbucket
    // and the offsets must come back via a broadcast join.
    val singleParts = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(singleParts <= 1, s"expected at most one tiny SinglePartition, got $singleParts:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$plan")
    assert(plan.contains("windowspecdefinition(_gbucket"),
      s"fact-side window not bucket-partitioned:\n$plan")
  }
}
