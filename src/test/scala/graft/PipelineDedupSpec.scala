package graft

/** The composed dedup pipeline (q_dedup_pipeline): one pair-table
  * materialization must feed clusters + keep list + split, and the
  * composition must agree row-for-row with the standalone queries it
  * fuses (which each recompute the pairs from scratch). */
class PipelineDedupSpec extends SparkSuite {

  test("q_dedup_pipeline agrees with the standalone cluster/keep/split queries") {
    val rows = SparkEntry.queries("q_dedup_pipeline")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, s"one row per doc: ${rows.length} vs $nDocs")
    val byCluster = rows.groupBy(_.getLong(1))
    assert(byCluster.values.forall(_.count(_.getBoolean(3)) == 1),
      "exactly one representative per cluster")
    assert(byCluster.values.forall(rs => rs.map(_.getString(4)).toSet.size == 1),
      "split must be constant within a cluster (the leakage-safety contract)")
    assert(byCluster.values.forall(rs => rs.forall(_.getLong(2) == rs.length)),
      "cluster_size = full-corpus member count (singletons = 1)")
    // differential vs the standalone queries this composes
    val keepStandalone = SparkEntry.queries("q_dedup_keep_best")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
      == keepStandalone, "keep list diverges from q_dedup_keep_best")
    val splitStandalone = SparkEntry.queries("q_split_leakage_safe")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getString(4))).toSet
      == splitStandalone, "split diverges from q_split_leakage_safe")
  }

  test("q_dedup_pipeline's final plan holds no pair machinery (ran once)") {
    // positive control first: a query that does NOT checkpoint its pair
    // table carries the native shingle expression in its executed plan,
    // so the probe below can actually fail
    val standalone = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(standalone.contains("wordshingles"),
      "probe broken: expected the shingle expression in q_dedup_minhash's plan")
    val plan = SparkEntry.queries("q_dedup_pipeline")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("wordshingles") && !plan.contains("minhash"),
      "pair generation must be materialized once (localCheckpoint), " +
        s"not replayed downstream:\n$plan")
    assert(plan.contains("existingrdd"),
      "downstream stages must read the checkpointed tables")
  }
}
