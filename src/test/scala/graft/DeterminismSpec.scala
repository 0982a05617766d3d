package graft

/** Partition-count invariance: every oracle-checked query must return
  * the IDENTICAL row multiset under different shuffle-partition counts.
  *
  * This is determinism-at-scale in miniature: on a real cluster the
  * partition count (and with it summation order, merge order, and
  * which rows share a task) is an operational knob, not a semantic
  * input. A query whose output drifts with it would pass the DuckDB
  * oracle on one layout and hash-mismatch on another. The no-oracle
  * queries are excluded by construction — sketch merge order (approx
  * percentile) and k-means float summation (IVF) are documented as
  * layout-sensitive, which is exactly why they are recall/error-gated
  * instead of hash-compared.
  */
class DeterminismSpec extends SparkSuite {

  test("oracle-checked queries are invariant to shuffle partition count") {
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
    val failures = scala.collection.mutable.Buffer[String]()
    def snapshot(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect().map(_.mkString("")).sorted.toSeq
    }
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (name <- names) {
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val a = snapshot(name)
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        val b = snapshot(name)
        if (a != b) {
          val diff = (a.diff(b) ++ b.diff(a)).take(3)
          failures += s"$name: ${a.size} vs ${b.size} rows; sample diff: ${diff.mkString(" | ")}"
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
    assert(failures.isEmpty,
      s"partition-count-sensitive queries:\n${failures.mkString("\n")}")
  }

  test("oracle-checked queries are invariant to AQE on/off") {
    // AQE rewrites the physical plan at runtime (join strategy demotion,
    // partition coalescing, skew splitting) — all of which change
    // summation/merge order and row-task assignment at real scale. A
    // query whose OUTPUT depends on any of that would silently diverge
    // the day a cluster flips the flag, so outputs must hash identically
    // with the optimizer on and off.
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
    val failures = scala.collection.mutable.Buffer[String]()
    def snapshot(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect().map(_.mkString("")).sorted.toSeq
    }
    val original = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      for (name <- names) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val off = snapshot(name)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        val on = snapshot(name)
        if (off != on) {
          val diff = (off.diff(on) ++ on.diff(off)).take(3)
          failures += s"$name: ${off.size} vs ${on.size} rows; sample diff: ${diff.mkString(" | ")}"
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", original)
    assert(failures.isEmpty,
      s"AQE-sensitive queries:\n${failures.mkString("\n")}")
  }
}
