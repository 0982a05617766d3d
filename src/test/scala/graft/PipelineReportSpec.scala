package graft

/** The pipeline ship report (q_pipeline_report): the dataset-card
  * stats must be DERIVED from the composed pipeline's own work — one
  * pair checkpoint, one assignment checkpoint, ONE gram table behind a
  * single reused exchange — and must agree with the standalone queries
  * whose semantics it absorbs (q_source_overlap row-for-row, the
  * contamination counts with q_pipeline_full's per-doc flags). */
class PipelineReportSpec extends SparkSuite {

  private lazy val report =
    SparkEntry.queries("q_pipeline_report")(spark, sfDir).collect()

  test("overlap rows equal standalone q_source_overlap") {
    val composed = report.filter(_.getString(0) == "overlap")
      .map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSet
    val standalone = SparkEntry.queries("q_source_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(composed == standalone,
      "absorbed source-overlap diverges from the standalone query")
  }

  test("contamination counts equal q_pipeline_full's per-doc flags") {
    val full = SparkEntry.queries("q_pipeline_full")(spark, sfDir).collect()
    val expected = full.filterNot(_.getString(4) == "train")
      .groupBy(_.getString(4))
      .map { case (split, rs) =>
        split -> (rs.count(_.getBoolean(5)).toLong, rs.length.toLong) }
    val composed = report.filter(_.getString(0) == "contamination")
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(composed.keySet == expected.keySet,
      s"one contamination row per eval split: $composed vs $expected")
    expected.foreach { case (split, (nContam, nSplit)) =>
      assert(composed(split) == nContam,
        s"$split: composed ${composed(split)} vs per-doc flags $nContam")
      val rate = report.find(r => r.getString(0) == "contamination" &&
        r.getString(1) == split).get.getDouble(4)
      assert(math.abs(rate - nContam.toDouble / nSplit) < 1e-4,
        s"$split contamination rate")
    }
  }

  test("ship rows: one representative kept per cluster, rates consistent") {
    val full = SparkEntry.queries("q_pipeline_full")(spark, sfDir).collect()
    val expected = full.groupBy(_.getString(4)).map { case (split, rs) =>
      split -> rs.count(_.getBoolean(3)).toLong }
    val composed = report.filter(_.getString(0) == "ship")
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(composed == expected,
      s"shipped-doc counts diverge: $composed vs $expected")
  }

  // r14: the materialized gram column is xxhash64(gram text) — 8 bytes
  // through the exchange/checkpoint instead of ~40 of text. All three
  // consumers test equality only, so the swap is invisible except for
  // 2⁻⁶⁴-per-pair hash merges; this differential witnesses collision
  // freedom on the fixture directly (the DuckDB oracle replays TEXT
  // grams, so the driver compare re-proves it at sf0.01 every round).
  test("hashed grams are collision-free vs text grams on the fixture") {
    import org.apache.spark.sql.functions._
    val grams = Tables.documents(spark, sfDir)
      .select(explode(graft.expressions.TextExpressions
        .wordShingles(col("text"), 5)).as("gtxt"))
    val counts = grams
      .agg(countDistinct(col("gtxt")).as("n_text"),
        countDistinct(xxhash64(col("gtxt"))).as("n_hash"))
      .head()
    assert(counts.getLong(0) == counts.getLong(1),
      s"xxhash64 collided on the fixture gram set: " +
        s"${counts.getLong(0)} text vs ${counts.getLong(1)} hashed")
    assert(counts.getLong(0) > 0, "probe broken: no grams on the fixture")
  }

  // The gram table is materialized ONCE at its g-keyed exchange
  // (repartition + localCheckpoint): per-consumer filter pushdown would
  // otherwise specialize the exchange subtree per branch and defeat
  // ReuseExchange (measured: 2-3 shingle subtrees survive the static
  // plan without the checkpoint). Structural contract, mirroring
  // PipelineDedupSpec's minhash probe: NO shingle machinery may appear
  // downstream of the checkpoints in the executed plan.
  test("the gram stage runs once: no shingle machinery downstream") {
    // positive control: a query that shingles inline carries the
    // expression in its plan, so the probe below can actually fail
    val ctl = SparkEntry.queries("q_contamination")(spark, sfDir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(ctl.contains("wordshingles"),
      "probe broken: expected wordshingles in q_contamination's plan")
    for (q <- Seq("q_pipeline_report", "q_pipeline_full")) {
      val p = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.toLowerCase
      assert(!p.contains("wordshingles") && !p.contains("minhash"),
        s"$q: every shingle pass (pairs at width 3, grams at width 5) " +
          s"must be materialized once, not replayed per consumer:\n$p")
      assert(p.contains("existingrdd"),
        s"$q: downstream stages must read the checkpointed tables")
    }
  }
}
