package graft

import org.apache.spark.sql.functions._

/** Pins the build-once/serve-many contract of the persisted standing
  * indexes (r13 VERDICT item 1): the serve plans must read the on-disk
  * index — never re-shingle / re-sign / re-scan the standing corpus —
  * and the served results must equal a direct recompute. */
class StandingIndexSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def countOccurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("near-dup increment equals the direct batch-vs-corpus recompute") {
    val got = SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: exact Jaccard over every (batch, corpus) pair —
    // test-only quadratic baseline on the tiny fixture
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.text.TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val b = sh.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("bid"), col("sh").as("sb"))
    val c = sh.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("cid"), col("sh").as("sc"))
    val expected = b.crossJoin(c)
      .withColumn("inter", size(array_intersect(col("sb"), col("sc"))))
      .withColumn("j",
        col("inter") / (size(col("sb")) + size(col("sc")) - col("inter")))
      .filter(col("j") >= 0.9)
      .select(col("bid"), col("cid"), round(col("j"), 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"persisted-index serve diverges from direct recompute: " +
        s"extra=${got -- expected}, missing=${expected -- got}")
  }

  test("near-dup serve reads the index, never re-shingles the corpus") {
    // first call built the index (differential test above); this plan
    // is the steady-state serve
    val p = plan("q_dedup_incremental_near")
    // the batch side shingles ONCE into a checkpoint (ExistingRDD) that
    // both the banding and the verification attach read; documents
    // itself therefore appears NOWHERE in the serve plan — any
    // occurrence would mean a corpus (or second batch) re-shingle
    assert(countOccurrences(p, "documents.parquet") == 0,
      s"the serve plan must read no raw documents scan:\n$p")
    assert(p.contains("ExistingRDD"),
      s"batch shingles must come from the one checkpointed table:\n$p")
    for (t <- Seq("/bands", "/members", "/shingles"))
      assert(p.contains(t), s"serve must read the persisted $t table:\n$p")
  }

  test("near-dup serve survives a fresh catalog (DDL re-registration)") {
    val t = SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .collect().map(_.toString).sorted
    // simulate a new session: the data outlives the in-memory catalog
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_nd_"))
      .foreach(x => spark.sql(s"DROP TABLE ${x.name}"))
    val again = SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(again.sameElements(t),
      "re-registered (CREATE TABLE ... CLUSTERED BY) index must serve " +
        "identical results")
  }

  test("maintained + LSH indexes survive a fresh catalog with the DDL " +
      "bucket contract intact") {
    // r14 VERDICT stretch 8: registerNearDup/registerLsh re-create the
    // tables with a hand-written CLUSTERED BY spec — if it drifts from
    // Layout.writeBucketed's, the exchange-free contract silently
    // breaks. Pin it: a fresh catalog must re-register and serve
    // IDENTICAL results through a plan whose exchange count is
    // unchanged (a lost bucket spec surfaces as an extra index-side
    // exchange).
    for ((q, prefix) <- Seq(
        ("q_index_append", "graft_nda_"),
        ("q_ann_lsh_big_persisted", "graft_lshb_"))) {
      val before = SparkEntry.queries(q)(spark, sfDir)
      val rows = before.collect().map(_.toString).sorted
      val exchanges = countOccurrences(
        before.queryExecution.executedPlan.toString, "Exchange")
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith(prefix))
        .foreach(x => spark.sql(s"DROP TABLE ${x.name}"))
      val after = SparkEntry.queries(q)(spark, sfDir)
      assert(after.collect().map(_.toString).sorted.sameElements(rows),
        s"$q: re-registered index must serve identical results")
      assert(countOccurrences(
          after.queryExecution.executedPlan.toString, "Exchange") ==
        exchanges,
        s"$q: re-registration changed the serve plan's exchange count " +
          "- the DDL bucket spec drifted from Layout.writeBucketed's")
    }
  }

  test("ann serve prunes to probed cells and never re-scans the corpus") {
    val df = SparkEntry.queries("q_ann_persisted")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // every embeddings scan in the serve plan must be the QUERY side
    // (qid pushdown present) — the corpus lives only in the index, so a
    // pushdown-free embeddings scan would be a corpus re-scan. (The
    // query-side scan legitimately prints twice when dynamic partition
    // pruning reuses it as the pruning subquery.)
    val scans = countOccurrences(p, "embeddings.parquet")
    assert(scans >= 1 &&
        scans == countOccurrences(p, "LessThan(vec_id,10)"),
      s"every embeddings scan must carry the query-side pushdown " +
        s"($scans scans):\n$p")
    assert(p.contains("/assignments"),
      s"serve must read the persisted assignment table:\n$p")
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(p).isDefined,
      s"the assignment scan must prune on the probed cells:\n$p")
  }

  test("ann serve returns k ranked neighbors per query") {
    val rows = SparkEntry.queries("q_ann_persisted")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "serve must return results on the fixture")
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 5, s"qid $qid: more than k rows")
      val ranked = rs.sortBy(_.getInt(3))
      assert(ranked.map(_.getInt(3)).toSeq == (1 to rs.length),
        s"qid $qid: rank numbers must be 1..k")
      assert(ranked.map(_.getDouble(2)).toSeq.reverse.sorted.reverse ==
        ranked.map(_.getDouble(2)).toSeq,
        s"qid $qid: cos_sim must be non-increasing in rank")
    }
  }

  test("append-maintained index answers identically to the monolithic one") {
    // the maintenance contract: standing(%5∈{1,2}) + appended(%5∈{3,4})
    // must serve the probe exactly like the index built whole over %5≠0
    val mono = SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .collect().map(_.toString).toSet
    val maintained = SparkEntry.queries("q_index_append")(spark, sfDir)
      .collect().map(_.toString).toSet
    assert(maintained == mono,
      s"append-maintained serve diverges from monolithic: " +
        s"extra=${maintained -- mono}, missing=${mono -- maintained}")
    // and the append is once-only: a second serve must not re-append
    val builds = graft.sources.StandingIndex.buildLog.size
    SparkEntry.queries("q_index_append")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    assert(graft.sources.StandingIndex.buildLog.size == builds,
      "a second serve must not rebuild or re-append")
  }

  test("index builds once: repeat serves never rebuild") {
    SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val builds = graft.sources.StandingIndex.buildLog.size
    SparkEntry.queries("q_dedup_incremental_near")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("q_ann_persisted")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries("q_ann_persisted")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    assert(graft.sources.StandingIndex.buildLog.size == builds,
      "a second serve against the same content must not rebuild")
  }
}
