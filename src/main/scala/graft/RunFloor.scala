package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose the per-query session floor — DataFrame
  * construction (read.parquet listing + footer + plan build) vs
  * execution (analysis, optimization, job) — for a few floor-bound
  * queries. Usage: RunFloor <sfDir> <q...> */
object RunFloor {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.head
    val qs = args.tail.toSeq
    (1 to 4).foreach { pass =>
      // raw source-read construction cost
      val tr0 = System.nanoTime()
      Tables.lineitem(spark, d)
      val tr = (System.nanoTime() - tr0) / 1e9
      println(f"pass $pass read.parquet(lineitem) construct: $tr%.3f s")
      // pure job floor: a 10-row range through the same noop sink
      val tn0 = System.nanoTime()
      spark.range(10).write.format("noop").mode("overwrite").save()
      println(f"pass $pass range(10) noop: ${(System.nanoTime() - tn0) / 1e9}%.3f s")
      val tn1 = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id) as s")
        .write.format("noop").mode("overwrite").save()
      println(f"pass $pass range-agg noop: ${(System.nanoTime() - tn1) / 1e9}%.3f s")
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, d)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"pass $pass $q%-14s construct=${(t1 - t0) / 1e9}%.3f s " +
          f"execute=${(t2 - t1) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
