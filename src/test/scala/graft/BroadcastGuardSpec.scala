package graft

import org.apache.spark.sql.functions._

/** Pins the r13 vocabulary-broadcast policy ([[BroadcastGuard]]): a
  * dim table whose measured payload fits under half the ceiling
  * broadcasts; past it, the SAME join degrades to shuffle_hash and the
  * results are bit-identical — so the 100 TB vocabulary (Heaps-law
  * growth, billions of hapax tokens) can never walk the bm25 /
  * surprisal / tfidf family off Spark's 8 GB broadcast cliff. A policy
  * edit that breaks either side breaks this spec instead of surfacing
  * as a driver OOM at scale. */
class BroadcastGuardSpec extends SparkSuite {

  private def withCeiling[T](bytes: Long)(f: => T): T = {
    val prev = spark.conf.getOption(BroadcastGuard.MaxBytesKey)
    spark.conf.set(BroadcastGuard.MaxBytesKey, bytes.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(BroadcastGuard.MaxBytesKey, v)
      case None => spark.conf.unset(BroadcastGuard.MaxBytesKey)
    }
  }

  private def fixture = {
    val fact = spark.range(1000)
      .select((col("id") % 50).cast("string").as("tok"), col("id").as("v"))
    val dim = spark.range(50)
      .select(col("id").cast("string").as("tok"), (col("id") * 7).as("w"))
    (fact, dim)
  }

  test("under the ceiling the dim side broadcasts") {
    val (fact, dim) = fixture
    val p = fact.join(
        BroadcastGuard.dim(dim, length(col("tok")) + lit(8), "spec-dim"),
        "tok")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"small measured payload must take the broadcast path:\n$p")
  }

  test("past the ceiling the join degrades to shuffle_hash, same result") {
    val (fact, dim) = fixture
    val expected = fact.join(broadcast(dim), "tok")
      .collect().map(_.toString).sorted
    withCeiling(16L) {
      val guarded = fact.join(
        BroadcastGuard.dim(dim, length(col("tok")) + lit(8), "spec-dim"),
        "tok")
      val p = guarded.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"oversized dim must fall back to shuffle_hash:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"oversized dim must NOT broadcast:\n$p")
      assert(guarded.collect().map(_.toString).sorted.sameElements(expected),
        "fallback join must be result-identical to the broadcast join")
    }
  }

  test("opt-out ceiling skips the sizing pass (no checkpoint in the plan)") {
    val (_, dim) = fixture
    withCeiling(Long.MaxValue) {
      val out = BroadcastGuard.dim(dim, length(col("tok")) + lit(8), "spec-dim")
      // an unbounded ceiling must not execute the dim plan to size it:
      // the returned plan is the original relation (no LogicalRDD from
      // localCheckpoint), wrapped in the broadcast hint
      val lp = out.queryExecution.analyzed.toString
      assert(!lp.contains("LogicalRDD"),
        s"opt-out must not checkpoint (= not execute) the dim plan:\n$lp")
    }
  }

  test("the three vocabulary queries are result-invariant under fallback") {
    // the correctness half of VERDICT r12 item 1's done-condition: with
    // the ceiling forced below any real table, every guarded query runs
    // the shuffle_hash shape end-to-end and still matches its own
    // broadcast-shape output
    for (q <- Seq("q_bm25", "q_lm_surprisal", "q_tfidf")) {
      val base = SparkEntry.queries(q)(spark, sfDir)
        .collect().map(_.toString).sorted
      val fallback = withCeiling(16L) {
        SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toString).sorted
      }
      assert(fallback.sameElements(base),
        s"$q must be result-invariant under the shuffle_hash fallback")
    }
  }
}
