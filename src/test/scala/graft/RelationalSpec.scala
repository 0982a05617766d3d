package graft

import org.apache.spark.sql.functions._

/** TeraValidate analog (SURVEY §5): the global sort must be totally
  * ordered AND a permutation of its input; plus sanity on flagship. */
class RelationalSpec extends SparkSuite {

  test("q_sort_global is globally sorted and multiset-equal to input") {
    val sorted = SparkEntry.queries("q_sort_global")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // global order under (l_orderkey, l_linenumber)
    val keys = sorted.map(r => (r._1, r._2))
    assert(keys.zip(keys.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
    }, "output not globally sorted")
    // multiset equality with the source (TeraValidate's permutation check)
    val src = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(sorted.sorted.sameElements(src.sorted), "not a permutation of input")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sfDir).head()
    val li = Tables.lineitem(spark, sfDir)
    val exactOrders = li.select(col("l_orderkey")).distinct().count()
    val exactParts = li.select(col("l_partkey")).distinct().count()
    assert(math.abs(approx.getLong(0) - exactOrders).toDouble / exactOrders < 0.05)
    assert(math.abs(approx.getLong(1) - exactParts).toDouble / exactParts < 0.05)
  }

  test("broadcast join plans as BroadcastHashJoin (fact not shuffled)") {
    val plan = SparkEntry.queries("q_join_bcast")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }
}
