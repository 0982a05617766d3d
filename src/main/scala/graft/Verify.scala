package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional trailing query names: dump/check only those (dev loop);
    // the driver passes none and gets the full surface
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // every query's exchanges run through the occupied transport seam
      // (the reference's plug point), not just ShuffleSeamSpec
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      // measured default from the codec matrix (SHUFFLE_TUNING.md)
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val sel = if (only.isEmpty) SparkEntry.queries
              else SparkEntry.queries.view.filterKeys(only).toMap
    sel.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // accuracy artifact for the hash-seeded no-oracle queries: recall /
    // error / exact-equality vs in-Spark ground truth, machine-readable
    if (only.isEmpty) try {
      val acc = graft.Accuracy.checks(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/accuracy.json"),
        graft.Accuracy.toJson(acc))
      // persist per round next to CORRECTNESS_r<N>.json so the no-oracle
      // greens are part of the committed round record, not just /tmp
      try {
        val repo = Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo"))
        val round = RoundStamp.round(repo)
        Files.writeString(repo.resolve(f"ACCURACY_r$round%02d.json"),
          graft.Accuracy.toJson(acc))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] could not persist round accuracy: $e")
      }
      acc.filterNot(_.pass).foreach(c =>
        System.err.println(s"[verify] ACCURACY FAIL ${c.query}: ${c.metric}=${c.value}"))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] accuracy checks failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
