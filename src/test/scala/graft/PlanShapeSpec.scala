package graft

/** Physical-plan shape assertions for the round-3 operators: the
  * map-side ops must stay map-side (no exchange anywhere in the plan),
  * and the sampled group-cap must run through the partial→final
  * GroupTopK ladder rather than a window sort. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("chunking, redaction, and quantization are shuffle-free") {
    for (q <- Seq("q_text_chunks", "q_redact", "q_embed_quantize")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q should be map-side only:\n$p")
    }
  }

  test("per-group sampling uses partial+final GroupTopK, one exchange") {
    val p = plan("q_sample_group")
    assert(p.contains("GroupTopK"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one exchange, got $exchanges:\n$p")
  }

  test("end-to-end pipeline has exactly one exchange (the dedup cap)") {
    val p = plan("q_pipeline")
    assert(p.contains("GroupTopK") && p.contains("Generate"), p)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"quality gate + chunking must stay map-side around one dedup exchange, got $exchanges:\n$p")
  }

  test("OR-join rewrite contains no nested-loop or cartesian join") {
    val p = plan("q_join_or")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"disjunctive join must run as union of equi-joins:\n$p")
  }

  test("no query plans a cartesian/nested-loop join, except documented paths") {
    // Every entry here is a deliberate, bounded exception:
    //  - q_ann_cosine: brute-force baseline — few queries BROADCAST
    //    against the corpus (documented contract, candidates never shuffle)
    //  - q_quality_filter / q_tfidf / q_source_mix / q_mix_rebalance: a
    //    1-row global statistic crossJoined back via broadcast (BNLJ
    //    over one row)
    val allowed = Set("q_ann_cosine", "q_quality_filter", "q_tfidf",
      "q_source_mix", "q_mix_rebalance")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowed)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(s"$name: cartesian")
        else if (p.contains("BroadcastNestedLoopJoin")) Some(s"$name: BNLJ")
        else None
      }
    assert(offenders.isEmpty,
      s"unexpected non-equi join strategies:\n${offenders.mkString("\n")}")
  }

  test("no query plans an unbounded-following window frame") {
    // WindowExec evaluates [current, unbounded following] frames by
    // recomputing the aggregate for every row — O(group²); the forward
    // scan must always be expressed as a descending-order running frame
    // (q_interp measured 351 s vs 0.9 s at sf0.1 on exactly this)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString.toLowerCase
      if (p.contains("unboundedfollowing")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded-following frames found in: ${offenders.mkString(", ")}")
  }

  test("bloom probe is the native might_contain expression, not a UDF") {
    val p = plan("q_bloom_dedup")
    assert(p.contains("might_contain"),
      s"expected Catalyst BloomFilterMightContain in the probe:\n${p.take(2000)}")
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      s"bloom probe must not fall back to a UDF:\n${p.take(2000)}")
  }

  test("hinted join strategies actually plan their strategy") {
    // the SHUFFLE_HASH hint silently degrades to SMJ if the hint is
    // dropped (renamed column, subquery boundary) — pin the strategy
    assert(plan("q_join_shash").contains("ShuffledHashJoin"),
      "q_join_shash must plan a ShuffledHashJoin")
    assert(plan("q_join_smj").contains("SortMergeJoin"),
      "q_join_smj must plan a SortMergeJoin")
    assert(plan("q_join_bcast").contains("BroadcastHashJoin"),
      "q_join_bcast must plan a BroadcastHashJoin")
  }

  test("quality filter broadcasts the corpus statistic") {
    val p = plan("q_quality_filter")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"median must reach the filter via broadcast:\n$p")
  }
}
