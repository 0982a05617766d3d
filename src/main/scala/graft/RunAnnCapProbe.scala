package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Ann

/** Dev utility: sweep (maxBucket, capPerQuery) configs of the bounded
  * ANN path at a fixture dir and print recall vs brute force — the
  * adjudication record behind the capped-regime ACCURACY gate (r13).
  * Findings it pins: (a) shrinking caps to force binding at the 500-
  * vector fixture misrepresents the shipped geometry (maxBucket=1 →
  * recall 0.47, a 1-of-2 random bucket sample no deployment runs);
  * (b) near-copy augmented replicas (below) are degenerate the other
  * way — planted twins share nearly all band keys, recall pins at 1.0
  * and caps never alter the result set. Hence the gate in
  * [[Accuracy]]: scale the corpus with the decorrelated ScaleFixture
  * construction to where the SHIPPED config binds, and measure there
  * (0.903 at factor 40 from sf0.01). */
object RunAnnCapProbe {

  /** 8 deterministic near-copies per vector (element-wise factors from
    * a small integer hash — never `rand()`, the artifact must replay),
    * decorrelating angles by ~1-3 degrees: bucket occupancy grows ~9x
    * while the true top-5 of an original stays dominated by its own
    * replicas — the planted-twin structure the bounded path must keep. */
  def augment(e: DataFrame, replicas: Int): DataFrame = {
    val reps = (1 to replicas).map { j =>
      e.select((col("vec_id") + j * 10000000L).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> x * (1.0 + " +
          s"((vec_id * 17 + $j * 31 + i * 7) % 11 - 5) * 0.004))")
          .as("embedding"))
    }
    reps.foldLeft(e.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")))(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, sfDir)
    val corpus = augment(e, 8).localCheckpoint()
    val qBig = corpus.filter(col("vec_id") % 5 === 0 &&
      col("vec_id") < 10000000L)
    println(s"corpus=${corpus.count()} queries=${qBig.count()}")
    val brute = Ann.bruteForceTopK(qBig, corpus, "vec_id", "embedding", 5)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unc = Ann.lshTopKBounded(qBig, corpus, "vec_id", "embedding", 5,
        dim = 64, maxBucket = 1000000, capPerQuery = 1000000)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"uncapped banding recall=${(brute & unc).size.toDouble / brute.size}%.3f")
    for ((mb, cpq) <- Seq((8, 100), (12, 250), (16, 400), (12, 2000))) {
      val capped = Ann.lshTopKBounded(qBig, corpus, "vec_id", "embedding", 5,
          dim = 64, maxBucket = mb, capPerQuery = cpq)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val binds = capped != unc
      println(f"maxBucket=$mb%3d capPerQuery=$cpq%4d recall=${
        (brute & capped).size.toDouble / brute.size}%.3f binds=$binds")
    }
    spark.stop()
  }
}
