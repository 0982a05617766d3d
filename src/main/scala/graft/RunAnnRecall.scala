package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: sampled recall of the bounded ANN mode at the sf1
  * scale fixture (see [[Bench.boundedAnnRecallSf1]]).
  * Usage: RunAnnRecall [scaleDir] */
object RunAnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"bounded ANN recall vs brute at $dir: ${Bench.boundedAnnRecallSf1(spark, dir)}")
    println(s"bounded ANN near-dup recall at $dir: ${Bench.boundedAnnNearDupRecallSf1(spark, dir, "/root/testdata/sf0.1", 10)}")
    spark.stop()
  }
}
