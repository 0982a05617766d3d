package graft

import graft.plans.GroupTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSuite {

  private lazy val orders = Tables.orders(spark, sfDir)

  test("custom top-k operator == row_number window formulation") {
    val custom = GroupTopK.topKPerGroup(orders,
        Seq(orders("o_custkey")),
        Seq(orders("o_totalprice").desc, orders("o_orderkey").asc), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val window = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("plans as partial+final GroupTopKExec around one exchange, no sort") {
    val df = GroupTopK.topKPerGroup(orders,
      Seq(orders("o_custkey")),
      Seq(orders("o_totalprice").desc, orders("o_orderkey").asc), k = 3)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints as "GroupTopK"
    assert("GroupTopK \\[".r.findAllIn(plan).length == 2,
      s"expected partial+final exec pair:\n$plan")
    assert(plan.contains("Exchange"), "expected a hash exchange on the group key")
    assert(!plan.contains("Sort "), s"top-k must not sort:\n$plan")
  }

  test("empty group list = global top-k (partial caps each map task)") {
    val global = GroupTopK.topKPerGroup(orders, Seq.empty,
        Seq(orders("o_totalprice").desc, orders("o_orderkey").asc), k = 10)
      .select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val expect = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(global == expect)
  }

  /** Runs `body` with the buffered-row budget forced down to `rows`,
    * so both the partial-pass flush path and the final-pass external
    * sort fallback execute even on the small fixture. */
  private def withBudget[T](rows: Long)(body: => T): T = {
    spark.conf.set(GroupTopK.MaxBufferedRowsKey, rows.toString)
    try body finally spark.conf.unset(GroupTopK.MaxBufferedRowsKey)
  }

  test("tiny budget (partial flush + final sort fallback) matches window") {
    val custom = withBudget(7) {
      GroupTopK.topKPerGroup(orders,
          Seq(orders("o_custkey")),
          Seq(orders("o_totalprice").desc, orders("o_orderkey").asc), k = 3)
        .select("o_custkey", "o_orderkey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val window = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("k=1 on a near-unique key under a tiny budget (the dedup shape)") {
    // groups ≈ rows: the exact shape that OOMs an unbounded heap map —
    // every final-pass task must take the external-sort fallback
    val deduped = withBudget(16) {
      GroupTopK.topKPerGroup(orders,
          Seq(orders("o_orderkey")),
          Seq(orders("o_totalprice").asc), k = 1)
        .select("o_orderkey").collect().map(_.getLong(0))
    }
    assert(deduped.length == deduped.distinct.length)
    assert(deduped.toSet ==
      orders.select("o_orderkey").collect().map(_.getLong(0)).toSet)
  }

  test("global top-k under a tiny budget matches limit") {
    val global = withBudget(4) {
      GroupTopK.topKPerGroup(orders, Seq.empty,
          Seq(orders("o_totalprice").desc, orders("o_orderkey").asc), k = 10)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    }
    val expect = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(global == expect)
  }

  test("k larger than any group returns all rows") {
    val n = orders.count()
    val all = GroupTopK.topKPerGroup(orders,
      Seq(orders("o_custkey")),
      Seq(orders("o_orderkey").asc), k = Int.MaxValue).count()
    assert(all == n)
  }
}
