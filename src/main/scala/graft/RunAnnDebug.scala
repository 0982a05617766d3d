package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: config sweep for the bounded ANN path at a scale
  * fixture — sampled top-5 recall vs brute and (optionally) the
  * corpus-vs-corpus wall time that bounds the registry query's cost.
  * Usage: RunAnnDebug [scaleDir] [timeCorpus=0|1]
  */
object RunAnnDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val timeCorpus = args.lift(1).contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.similarity.Ann

    val e = Tables.embeddings(spark, dir)
    val q = e.filter(pmod(xxhash64(col("vec_id")), lit(499)) === 0)
    val brute = Ann.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"brute top-5 pairs: ${brute.size}")

    // (numSigs, bands-per-sig, maxBucket, capPerQuery)
    // (the committed default first; add rows to sweep alternatives)
    val configs = Seq(
      (16, 8, 64, 2000))    // 128 x 8-bit bands, 1024-bit ham
    for ((ns, b, mb, cap) <- configs) {
      val t0 = System.nanoTime()
      val got = Ann.lshTopKBounded(q, e, "vec_id", "embedding", 5,
          dim = 64, bits = 64, bands = b, maxBucket = mb,
          capPerQuery = cap, numSigs = ns)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val tQ = (System.nanoTime() - t0) / 1e9
      val rec = (brute & got).size.toDouble / brute.size
      val tC = if (timeCorpus) {
        val t1 = System.nanoTime()
        Ann.lshTopKBounded(e, e, "vec_id", "embedding", 5,
            dim = 64, bits = 64, bands = b, maxBucket = mb,
            capPerQuery = cap, numSigs = ns)
          .write.format("noop").mode("overwrite").save()
        f" corpus ${(System.nanoTime() - t1) / 1e9}%7.1f s"
      } else ""
      println(f"sigs=$ns%2d bands=$b%2d/sig maxBucket=$mb cap=$cap%4d  " +
        f"recall $rec%.3f  (sampled ${tQ}%5.1f s)$tC")
    }
    spark.stop()
  }
}
