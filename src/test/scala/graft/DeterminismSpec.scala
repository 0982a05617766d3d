package graft

import org.apache.spark.sql.functions._

/** The round-8 operators claim BIT-DETERMINISM across partitionings
  * (scaled-integer PageRank, decimal-exact k-means, integer-log2
  * surprisal, md5-keyed sharding). The oracle gate proves one run
  * matches DuckDB; this spec proves the stronger claim the Scaladocs
  * make — that shuffling the INPUT layout cannot change a single
  * output value — plus hand-computed sanity anchors the oracle can't
  * express. */
class DeterminismSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.mkString("")).sorted.toSeq
  }

  test("pagerank / kmeans / surprisal / sharding are partition-invariant") {
    for (name <- Seq("q_pagerank", "q_kmeans", "q_lm_surprisal",
        "q_shuffle_det", "q_incr_agg")) {
      val a = canon(SparkEntry.queries(name)(spark, sfDir))
      // second run under a different shuffle width: every cross-row
      // reduction now happens in a different order and grouping
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      try {
        val b = canon(SparkEntry.queries(name)(spark, sfDir))
        assert(a == b, s"$name output changed under repartitioning")
        assert(a.nonEmpty, s"$name empty")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  // ---- registry-wide layout-invariance sweep -------------------------
  // Every oracle-checked query must return the IDENTICAL row multiset
  // under different shuffle-partition counts AND with AQE on/off. On a
  // real cluster both are operational knobs, not semantic inputs: the
  // partition count changes summation/merge order and row-task
  // assignment, and AQE rewrites the physical plan at runtime (join
  // demotion, partition coalescing, skew splitting). A query whose
  // output drifts with either would pass the DuckDB oracle on one
  // layout and hash-mismatch on another. No-oracle queries are excluded
  // by construction — sketch merge order and IVF float summation are
  // documented layout-sensitive, which is exactly why they are
  // recall/error-gated instead of hash-compared. Three snapshots per
  // query cover both sweeps (5-vs-23 partitions at AQE on; 23
  // partitions at AQE on-vs-off).
  test("all oracle-checked queries are invariant to partition count and AQE") {
    val names = SparkEntry.oracleSql.keys.toSeq.sorted
    val failures = scala.collection.mutable.Buffer[String]()
    def snapshot(name: String): Seq[String] =
      canon(SparkEntry.queries(name)(spark, sfDir))
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      for (name <- names) {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val a = snapshot(name)
        spark.conf.set("spark.sql.shuffle.partitions", "23")
        val b = snapshot(name)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val c = snapshot(name)
        if (a != b || b != c) {
          val diff = (a.diff(b) ++ b.diff(a) ++ b.diff(c) ++ c.diff(b)).take(3)
          val which = if (a != b) "partition-count" else "AQE"
          failures += s"$name ($which): ${a.size}/${b.size}/${c.size} rows; " +
            s"sample diff: ${diff.mkString(" | ")}"
        }
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", origParts)
      spark.conf.set("spark.sql.adaptive.enabled", origAqe)
    }
    assert(failures.isEmpty,
      s"layout-sensitive queries:\n${failures.mkString("\n")}")
  }

  test("pagerank conserves total rank mass on a hand-built graph") {
    // triangle {1,2,3} plus pendant 4-1: undirected, integer ranks.
    // After any number of damped iterations, total mass stays
    // n * 10^9 up to the per-node truncation loss of the two integer
    // divisions (each div truncates < 1 unit per contribution, and
    // (85*x) div 100 truncates < 1 more).
    import spark.implicits._
    val e = Seq((1, 2), (1, 3), (2, 3), (1, 4)).toDF("a", "b")
    val ed = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    val deg = ed.groupBy(col("u")).agg(count(lit(1)).as("dg"))
    var r = deg.select(col("u"), lit(1000000000L).as("r"))
    for (_ <- 1 to 3) {
      r = ed.join(r, "u").join(deg, "u")
        .select(col("v"), expr("r div dg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("sc"))
        .select(col("v").as("u"),
          (lit(150000000L) + expr("(85 * sc) div 100")).as("r"))
    }
    val ranks = r.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(ranks.size == 4)
    val total = ranks.values.sum
    assert(total <= 4L * 1000000000L && total > 4L * 1000000000L - 1000,
      s"mass not conserved: $total")
    // node 1 has degree 3 (hub) — highest rank; pendant 4 the lowest
    assert(ranks(1) > ranks(2) && ranks(1) > ranks(3) && ranks(1) > ranks(4))
    assert(ranks(4) < ranks(2) && ranks(4) < ranks(3))
  }

  test("NfcNormalize composes, is idempotent, and survives codegen") {
    import spark.implicits._
    val decomposed = "cafe\u0301"      // e + combining acute
    val composed = "caf\u00E9"        // precomposed e-acute
    val df = Seq(decomposed, composed, "plain ascii", "",
      "a\u0300b").toDF("s")
      .select(graft.expressions.NfcNormalize.nfcNormalize(col("s")).as("n"))
    val got = df.as[String].collect().toSeq
    assert(got(0) == composed, "combining acute must compose")
    assert(got(1) == composed, "already-composed is untouched")
    assert(got(2) == "plain ascii")
    assert(got(3) == "")
    assert(got(4) == "\u00E0b", "a + combining grave composes")
    // double application changes nothing (canonical form is a fixpoint)
    val twice = df.select(
      graft.expressions.NfcNormalize.nfcNormalize(col("n")).as("n2"))
      .as[String].collect().toSeq
    assert(twice == got)
  }

  test("surprisal bitlen identity: floor(log2(n)) == length(bin(n)) - 1") {
    import spark.implicits._
    val ns = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L, 123456789L)
    val got = ns.toDF("n")
      .select((length(expr("bin(n)")) - 1).as("fl"))
      .as[Int].collect().toSeq
    assert(got == ns.map(n => (math.log(n.toDouble) / math.log(2.0)).toInt))
  }
}
