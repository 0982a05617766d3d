package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the accuracy-check JSON for a fixture dir
  * (the same artifact Verify writes as accuracy.json). */
object RunAccuracy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(Accuracy.toJson(Accuracy.checks(spark, sfDir)))
    spark.stop()
  }
}
