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

  test("q_pipeline_full extends the pipeline with the contamination gate") {
    val full = SparkEntry.queries("q_pipeline_full")(spark, sfDir).collect()
    val base = SparkEntry.queries("q_dedup_pipeline")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getString(4))).toSet
    // the first five columns ARE q_dedup_pipeline — the composition adds
    // the contamination flag without disturbing cluster/keep/split
    assert(full.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3), r.getString(4))).toSet == base,
      "q_pipeline_full's cluster/keep/split diverge from q_dedup_pipeline")
    // train docs are the reference set: never flagged
    assert(full.filter(_.getString(4) == "train").forall(!_.getBoolean(5)),
      "a train doc must not be contaminated against itself")
    // semantic differential: contaminated = shares a 5-gram with a KEPT
    // train doc — recompute naively from the raw corpus
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams5(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      if (ts.length < 5) Set.empty
      else ts.sliding(5).map(_.mkString(" ")).toSet
    }
    val trainKept = full.filter(r => r.getString(4) == "train" &&
      r.getBoolean(3)).flatMap(r => grams5(docs(r.getLong(0)))).toSet
    full.filterNot(_.getString(4) == "train").foreach { r =>
      val expect = grams5(docs(r.getLong(0))).exists(trainKept)
      assert(r.getBoolean(5) == expect,
        s"doc ${r.getLong(0)}: contaminated=${r.getBoolean(5)}, naive=$expect")
    }
  }

  test("q_pipeline_full's final plan reads checkpoints, no minhash replay") {
    val plan = SparkEntry.queries("q_pipeline_full")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase
    // the pair stage (minhash signatures) must be materialized once;
    // since r13 the width-5 gram table is checkpointed too, so
    // PipelineReportSpec additionally bans wordshingles downstream —
    // this probe keeps the original minhash-specific pin
    assert(!plan.contains("minhash"),
      s"pair generation must not replay downstream of the checkpoint:\n$plan")
    assert(plan.contains("existingrdd"),
      "downstream stages must read the checkpointed tables")
  }
}
