package graft

import org.apache.spark.sql.functions._

/** Runtime filters: dynamic partition pruning and injected bloom
  * filters — both cut the big-side scan using facts only known at
  * execution time. At 100 TB these are the difference between reading
  * one partition and reading the table. */
class RuntimeFilterSpec extends SparkSuite {

  test("q_dpp plans a dynamicpruning subquery on the fact scan") {
    val plan = SparkEntry.queries("q_dpp")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected for a selective shuffled join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sfDir)
      val pt = Tables.part(spark, sfDir).filter(col("p_partkey") % 50 === 0)
      val q = li.join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"no bloom filter injected in:\n$optimized")
      assert(q.count() > 0)
    }
  }
}
