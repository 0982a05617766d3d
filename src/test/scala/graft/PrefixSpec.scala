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
