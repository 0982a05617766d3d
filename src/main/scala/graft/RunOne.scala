package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query (or all, sequentially with timings).
  * Usage: RunOne <sfDir> [queryName ...]  — prints name,rows,seconds. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n%-22s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch {
        case e: Throwable =>
          println(f"$n%-22s FAILED ${(System.nanoTime() - t0) / 1e9}%.2f s: " +
            e.getMessage.take(200))
      }
    }
    spark.stop()
  }
}
