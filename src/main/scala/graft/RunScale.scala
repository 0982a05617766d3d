package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: generate the [[ScaleFixture]] and time the scale
  * family against it (the same measurement Bench embeds in
  * bench_full_r<N>.json). Usage: RunScale [sfDir] */
object RunScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      // measured default from the codec matrix (SHUFFLE_TUNING.md)
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ambient = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val (factor, factor3, pts) = Bench.scalePointTimings(spark, sfDir,
      Map.empty[String, Double], ambient)
    pts.sortBy(_._1).foreach { case (k, p) =>
      val sf1 = p.sf1.map(m => f"${m.wall}%8.2f s u=${m.util}%.2f").getOrElse(
        s"cancelled@${p.cancelledAt.getOrElse(0)}s")
      val sf3 = p.sf3.map(m => f"  sf3(x$factor3) ${m.wall}%8.2f s u=${m.util}%.2f")
        .getOrElse("")
      val exp = p.sf1.map(m =>
        f"${math.log(m.wall / p.sf01.wall) / math.log(factor.toDouble)}%.2f").getOrElse("-")
      val stall = if (p.stallSuspect) "  STALL-SUSPECT" else ""
      println(f"$k%-20s sf0.1 ${p.sf01.wall}%7.2f s   sf1 $sf1   exp $exp$sf3$stall")
    }
    spark.stop()
  }
}
