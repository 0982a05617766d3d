package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one registry query with a per-stage metrics
  * listener — executor run/CPU time, shuffle bytes, spill, GC — the
  * fastest way to find WHICH exchange or join a regression lives in
  * (round 9 used this to catch a 3 100 CPU-s shuffle-write stage in
  * the triangle close). Usage: RunStages <query> <sfDir> */
object RunStages {
  def main(args: Array[String]): Unit = {
    val q = args(0); val d = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage max task duration (from task ends): run=cpu sums hide
    // whether a stage was 32 balanced tasks or one serialized straggler
    // — the r12 fuzzy-join find (a 31 s single-task eval stage) is
    // invisible without it
    val maxTaskMs = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          maxTaskMs.updateWith(te.stageId)(
            p => Some(math.max(p.getOrElse(0L), d)))
          ()
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          println(f"STAGE ${sc.stageInfo.stageId}%3d " +
            f"${sc.stageInfo.name.take(50)}%-50s " +
            f"tasks=${sc.stageInfo.numTasks}%4d " +
            f"maxTask=${maxTaskMs.getOrElse(sc.stageInfo.stageId, 0L) / 1e3}%6.1f s " +
            f"run=${m.executorRunTime / 1e3}%8.1f s " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1f s " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
            f"spill=${m.diskBytesSpilled / 1e6}%6.1f MB " +
            f"gc=${m.jvmGCTime / 1e3}%5.1f s")
        }
      })
    val t0 = System.nanoTime
    val n = SparkEntry.queries(q)(spark, d).collect().length
    println(f"TOTAL $q $d: wall=${(System.nanoTime - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}
