package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{BroadcastGuard, Tables}
import graft.text.TextFunctions
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.multimodal.Multimodal

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` fixtures: dedup (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard / embedding-cosine), similarity search (brute force + LSH),
  * text analysis (lang-ID, quality, token stats, fingerprints) and
  * multimodal binary-column plumbing.
  *
  * Queries whose algorithm is hash-seeded (MinHash bucketing internals,
  * SimHash, SRP-LSH) have no SQL oracle — DuckDB can't replay xxhash64 —
  * but their OUTPUT is still deterministic; where the algorithm's output
  * is hash-independent (LSH with exact verification at recall ≈ 1) an
  * exact-Jaccard oracle is declared.
  */
object LlmOps {

  private val EMBED_DIM = 64
  private val CHUNK_SIZE = 32
  private val CHUNK_STRIDE = 24

  /** The composed pipelines' shared prologue (q_pipeline_full /
    * q_pipeline_report — review r13: the ~25-line stage lived in two
    * verbatim copies, so a minhash/tiebreak/threshold tune could
    * silently diverge the two published artifacts): minhash pair table
    * checkpointed once → connected components → per-doc assignment
    * (cluster, full-corpus size, longest-copy representative,
    * md5-by-cluster leakage-safe split) checkpointed once. Returns
    * (docs, assigned). q_dedup_pipeline deliberately keeps its own
    * standalone copy — its per-query isolation (no shared checkpoints
    * with the full pipeline) is the point of having both registered. */
  private def pipelineAssignment(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9)
      .localCheckpoint()
    val cc = graft.dedup.Clusters
      .connectedComponents(pairs, "doc_a", "doc_b")
    val labeled = docs.select(col("doc_id"), col("n_chars"))
      .join(cc.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      .select(col("doc_id"), col("n_chars"), col("cluster_id"))
      .localCheckpoint()
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val h = substring(
      md5(concat(col("cluster_id").cast("string"), lit("split1"))), 1, 2)
    val assigned = labeled
      .withColumn("keep", row_number().over(w) === 1)
      .join(sizes, "cluster_id")
      .withColumn("split",
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("keep"), col("split"))
      .localCheckpoint()
    (docs, assigned)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d))),

    // LSH + exact-Jaccard verification at threshold 0.9: miss probability
    // per true pair ≈ (1-0.9⁴)¹⁶ ≈ 4e-8, so the output equals the exact
    // all-pairs answer (the declared oracle) with near certainty.
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9)),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)),

    // Pairs → connected components → canonical representative: the
    // keep/drop list a dedup pipeline actually consumes. Pair recall is
    // the LSH+exact-verification argument above; clustering on top is
    // deterministic, so the recursive-CTE closure oracle applies.
    "q_dup_clusters" -> ((s, d) =>
      graft.dedup.Clusters.dupClusters(
        Dedup.minhashPairs(Tables.documents(s, d), "doc_id", "text",
          shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9),
        "doc_a", "doc_b")),

    // Clusters → one representative per cluster over the FULL corpus
    // (singletons keep themselves): the keep/drop list the pipeline
    // applies to the lake. Representative = longest member (n_chars),
    // ties to the lowest doc_id — deterministic, so the closure oracle
    // extends with a plain window argmax.
    "q_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.dedup.Clusters.keepBest(
        docs.select(col("doc_id"), col("n_chars")), "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9),
        "doc_a", "doc_b", "n_chars")
    }),

    "q_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 3, threshold = 0.8)),

    // SRP-LSH banded candidates + exact-cosine verification at the
    // PRODUCTION near-dup threshold tau=0.9, where banding prunes the
    // candidate space to ~0 (the scalable regime — the tau=0.4 all-pairs
    // configuration survives only as DedupSpec's brute-force
    // differential). The synthetic corpus's max true cosine is ~0.51,
    // so near-dups are planted deterministically from the fixture
    // itself: a re-encoded (uniformly scaled — cosine exactly 1) copy
    // of every 50th vector and a one-coordinate-drifted (cosine ~0.99)
    // copy of every 50th+1. The oracle replays the identical
    // construction in SQL. Band WIDTH does the pruning (narrow 4-bit
    // bands collide on ~everything at corpus scale, tau or not), so
    // this runs the 16-bit-band config (bands=4 × numSigs=32 → 128
    // selective buckets/vector; the config the hi-tau scale point
    // measured at exponent 0.6): miss probability per true pair at
    // tau=0.9 is (1-p^16)^128 with p = 1-acos(.9)/pi ≈ 2e-5, and the
    // planted pairs sit at cosine ≥ 0.997 where it is ~1e-61 —
    // statistically exact either way.
    "q_dedup_embed" -> ((s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val scaled = base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          transform(col("v"), x => x * lit(0.5)).as("v"))
      val drifted = base.filter(col("vec_id") % 50 === 1)
        .select((col("vec_id") + 20000000L).as("vec_id"),
          concat(array(element_at(col("v"), 1) * lit(0.8)),
            slice(col("v"), 2, EMBED_DIM - 1)).as("v"))
      Dedup.embeddingPairs(base.union(scaled).union(drifted), "vec_id", "v",
        threshold = 0.9, dim = EMBED_DIM, bits = 64, bands = 4, numSigs = 32)
    }),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540,
    // public): partition the embedding space into ~k cells, then score
    // candidate pairs ONLY within a cell. The scale contract is the
    // paper's, and it is LIVE in the query: k GROWS with the corpus
    // (k = max(4, n/256), the same deterministic formula the oracle
    // replays), so mean cell size stays ~256 and pairwise work is
    // Σ|cell|² ≈ 256·n — linear, not n²/constant.
    //
    // TWO-LEVEL assignment (round-10 rework of the r9 scale finding:
    // a flat k-seed literal argmax is O(k·dim) per row with k ∝ n —
    // Θ(n²·dim/256) total — plus a k×dim driver collect and a k-branch
    // expression tree that outgrows codegen):
    //   level 1 — m = ⌈√k⌉ COARSE seeds (the m lowest-vec_id vectors;
    //     the only driver round-trip that scales, O(√k)·dim doubles,
    //     embedded as ONE literal array, not k expression branches);
    //     coarse(x) = argmax round-3 cosine, ties to the smaller index.
    //   level 2 — each coarse cell's own f = ⌈k/m⌉ lowest-vec_id
    //     members are its FINE seeds, selected distributively by
    //     GroupTopK (partial heaps bound the exchange; no driver
    //     state); fine(x) = argmax within x's coarse cell, ties to the
    //     smaller fine index. cell = coarse·f + fine.
    // Total cells ≈ m·f ≈ k, so mean cell size stays ~256; per-row
    // assignment cost is O((m+f)·dim) = O(√k·dim); the fine seeds ride
    // a per-coarse-cell array through one m-row equi-join (broadcast at
    // this scale, hash join beyond). This is hierarchical k-means
    // seeding — the same recursive-partition shape FAISS IVF uses —
    // with the paper's within-cell scoring unchanged. The within-cell
    // join is a plain equi-join on `cell` — no cartesian anywhere.
    // Near-dups are planted exactly as q_dedup_embed plants them (a
    // uniformly-scaled copy of every 50th vector, cosine exactly 1) so
    // the drop set is non-trivial on the random-geometry fixture. Drop
    // rule: in any pair (a < b) with cos ≥ 0.95, b is dropped — the
    // pipeline's keep-lowest-id representative. Output is per-cell
    // integer bookkeeping (total / dup pairs / dropped / kept),
    // hash-exact by construction.
    "q_dedup_semantic" -> ((s, d) => {
      // work-vs-bytes: the ~MB embeddings scan is 1 partition and the
      // per-row cosine argmaxes downstream are the cost — widen so the
      // checkpointed base is 32-way (r12 profile: 6-task stages,
      // maxTask 3.6 s)
      val base = Tables.widen(Tables.embeddings(s, d)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v")),
        col("vec_id"))
      val scaled = base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 10000000L).as("vec_id"),
          transform(col("v"), x => x * lit(0.5)).as("v"))
      val e = base.unionByName(scaled).localCheckpoint()
      // k = max(4, n/256): cells stay ~256 vectors wide as the corpus
      // grows (the count is a bounded driver scalar)
      val k = math.max(4L, e.count() / 256L).toInt
      val m = math.ceil(math.sqrt(k.toDouble)).toInt
      val f = math.ceil(k.toDouble / m).toInt
      val coarseSeeds: Seq[(Int, Seq[Double])] =
        e.orderBy(col("vec_id")).limit(m).select(col("v")).collect()
          .toSeq.zipWithIndex.map { case (r, i) =>
            (i, r.getSeq[Double](0).toSeq) }
      if (coarseSeeds.isEmpty)
        // empty corpus: no seeds, no cells — the empty relation with the
        // query's schema (an empty literal argmax would not compile a plan)
        e.select(lit(0).as("cell"), lit(0L).as("n_total"),
          lit(0L).as("n_dup_pairs"), lit(0L).as("n_dropped"),
          lit(0L).as("n_kept")).limit(0)
      else {
        // coarse argmax: ONE array literal scanned by transform —
        // constant-size expression tree no matter how large m grows
        val bestC = array_max(transform(typedLit(coarseSeeds), t =>
          struct(graft.vector.VectorFunctions
              .cosineRounded(col("v"), t.getField("_2"), 3).as("s"),
            (-t.getField("_1")).as("nc"))))
        val withCoarse = e
          .withColumn("coarse", -bestC.getField("nc"))
          .select(col("coarse"), col("vec_id"), col("v"))
          .localCheckpoint() // reused: fine-seed selection + assignment
        // fine seeds: each coarse cell's f lowest-vec_id members,
        // selected with bounded partial heaps (ids+vectors, ≤ m·f rows
        // out) — never collected to the driver
        val fineSeeds = graft.plans.GroupTopK.topKPerGroup(withCoarse,
          groupCols = Seq(col("coarse")),
          order = Seq(col("vec_id").asc), k = f)
        val fw = Window.partitionBy(col("coarse")).orderBy(col("vec_id"))
        val seedArrs = fineSeeds
          .withColumn("fidx", (row_number().over(fw) - 1).cast("int"))
          .groupBy(col("coarse"))
          .agg(array_sort(collect_list(struct(col("fidx"), col("v"))))
            .as("seeds"))
        val bestF = array_max(transform(col("seeds"), t =>
          struct(graft.vector.VectorFunctions
              .cosineRounded(col("v"), t.getField("v"), 3).as("s"),
            (-t.getField("fidx")).as("nf"))))
        val assigned = withCoarse.join(seedArrs, "coarse")
          .withColumn("cell", col("coarse") * lit(f) + (-bestF.getField("nf")))
          .select(col("cell"), col("vec_id"), col("v"))
          .localCheckpoint() // reused 3×: totals + both join sides
        val pairs = assigned
          .select(col("cell"), col("vec_id").as("a"), col("v").as("va"))
          .join(assigned
            .select(col("cell"), col("vec_id").as("b"), col("v").as("vb")),
            Seq("cell"))
          .filter(col("a") < col("b"))
          .filter(graft.vector.VectorFunctions
            .cosineRounded(col("va"), col("vb"), 3) >= 0.95)
          .select(col("cell"), col("a"), col("b"))
          .localCheckpoint() // reused 2×: pair counts + drop set
        val tot = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_total"))
        val pc = pairs.groupBy(col("cell")).agg(count(lit(1)).as("n_dup_pairs"))
        val dc = pairs.select(col("cell"), col("b")).distinct()
          .groupBy(col("cell")).agg(count(lit(1)).as("n_dropped"))
        tot.join(pc, Seq("cell"), "left").join(dc, Seq("cell"), "left")
          .select(col("cell"), col("n_total"),
            coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
            coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
            (col("n_total") - coalesce(col("n_dropped"), lit(0L)))
              .as("n_kept"))
      }
    }),

    // Dataset composition card: the per-(source, lang) corpus report a
    // training-data pipeline publishes alongside every snapshot — doc
    // counts, char volume, exact integer mean length and parts-per-
    // million corpus share. One partial+final aggregate over the facts;
    // the share denominator is a single driver-side scalar off the
    // already-dim-sized grouped table (the documented bounded round-trip
    // — a window-over-everything frame is banned by PlanShapeSpec, and a
    // constant-key broadcast would constant-fold to a nested-loop join).
    // All outputs are integers (div), so the result is hash-exact.
    "q_dataset_card" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .localCheckpoint() // dim-sized; reused for the total + the report
      val totalDocs = g.agg(coalesce(sum(col("n_docs")), lit(0L)))
        .head.getLong(0)
      if (totalDocs == 0L)
        g.select(col("source"), col("lang"), col("n_docs"),
          col("total_chars"), lit(0L).as("avg_chars_ppm"),
          lit(0L).as("pct_docs_ppm")).limit(0)
      else
        g.select(col("source"), col("lang"), col("n_docs"),
          col("total_chars"),
          expr("(total_chars * 1000000) div n_docs").as("avg_chars_ppm"),
          expr(s"(n_docs * 1000000) div ${totalDocs}L").as("pct_docs_ppm"))
    }),

    // embedding-space outlier report: the 5 vectors per label FURTHEST
    // (by cosine) from their label's centroid — the mislabeled/corrupt-
    // example scan of an embedding-quality pipeline. The centroid is the
    // per-dimension SUM (cosine is scale-invariant, so sum == mean with
    // no division to drift across engines), accumulated in decimals so
    // the cross-row reduction is order-independent; cosines are then
    // pure per-row double math on identical inputs. Centroid table is
    // nLabels×dim — broadcast; the corpus is scanned once for the
    // component aggregate and once for the scoring pass.
    "q_outlier_embed" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      val comp = e
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("x").cast("decimal(18,9)")).as("sx"))
      val cent = comp.groupBy(col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sx")))),
          t => t.getField("sx").cast("double")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("cos_c"), col("vec_id"))
      e.join(broadcast(cent), "label")
        .withColumn("cos_c",
          graft.vector.VectorFunctions.cosineRounded(col("v"), col("c"), 3))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("label"), col("vec_id"), col("cos_c"))
    }),

    "q_ann_cosine" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.bruteForceTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5)
    }),

    "q_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.lshTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, dim = EMBED_DIM)
    }),

    "q_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.ivfTopK(e.filter(col("vec_id") < 10), e,
        "vec_id", "embedding", k = 5, dim = EMBED_DIM)
    }),

    // corpus-vs-corpus retrieval: every 5th vector queries the whole
    // corpus through the all-shuffled LSH path (no broadcast anywhere —
    // the plan a 10^9-query set needs), in the BOUNDED operating mode:
    // deterministic per-bucket and per-query candidate caps keep total
    // work O(q·bands·maxBucket) instead of Ω(q·n·collision-rate). The
    // caps sit far above the sf0.01 bucket sizes, so the accuracy gate
    // measures the same candidate set as the uncapped path; they bind
    // exactly when the corpus outgrows them (see Ann.lshTopKBounded).
    "q_ann_lsh_big" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Ann.lshTopKBounded(e.filter(col("vec_id") % 5 === 0), e,
        "vec_id", "embedding", k = 5, dim = EMBED_DIM)
    }),

    // q_ann_lsh_big served from the PERSISTED bounded-LSH index
    // (VERDICT r14 item 3): the corpus-side signing / banding /
    // per-bucket capping is paid once at index build and every serve
    // signs only the probe batch (vec_id%5 = 0) against the standing
    // corpus (%5 ≠ 0) — zero corpus re-scan/re-sign, plan-asserted in
    // StandingIndexSpec; capped-regime recall driver-gated in ACCURACY
    // like the transient path.
    "q_ann_lsh_big_persisted" -> ((s, d) =>
      graft.sources.StandingIndex.lshBigServe(s, d)),

    // Stratified deterministic sampling: downweight the dominant
    // language, keep the tail — the canonical corpus-rebalancing step.
    // Pure map-side md5 predicate, replayable by any engine.
    "q_sample_stratified" -> ((s, d) =>
      graft.operators.Sampling.stratifiedHashSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"),
        cuts = Map("en" -> "20"), defaultCut = "80", salt = "s1")),

    "q_text_langid" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        round(TextFunctions.stopwordRatio(col("text")), 3).as("stop_ratio"),
        TextFunctions.langIdGuess(col("text")).as("lang_guess"))),

    "q_text_quality" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
        .withColumn("band",
          when(col("quality") >= 0.5, "high").otherwise("low"))),

    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.distinctTokenCount(col("text")).as("n_distinct"),
        TextFunctions.subwordCount(col("text")).as("n_subwords"))),

    // Model-based quality filter: a FROZEN linear scorer applied at
    // corpus scale — the fasttext/logistic "trained filter" stage of a
    // training-data pipeline, with the model reduced to literal integer
    // weights so the distributed run is hash-exact and engine-portable
    // (a float model could never be oracle-compared; in production the
    // weights arrive the same way — as a broadcast constant, never a
    // shuffle). Features are parts-per-million integers (type-token
    // ratio, capped length, capped mean token length), the score is
    // their weighted integer sum, and the verdict a threshold compare.
    // Pure map-side: native token-count expressions + one
    // regexp_replace, no exchange at all — at 100 TB this is a scan
    // that keeps pace with the I/O.
    "q_quality_model" -> ((s, d) => {
      val nTok = TextFunctions.tokenCount(col("text"))
      val nonspace = length(regexp_replace(col("text"), " ", ""))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          nTok.as("n_tok"),
          TextFunctions.distinctTokenCount(col("text")).as("n_distinct"),
          nonspace.as("nonspace"))
        .select(col("doc_id"), col("source"),
          when(col("n_tok") > 0,
            expr("(cast(n_distinct as bigint) * 1000000) div n_tok"))
            .otherwise(0L).as("ttr_ppm"),
          expr("(least(cast(n_chars as bigint), 500L) * 1000000) div 500")
            .as("len_ppm"),
          when(col("n_tok") > 0,
            expr("least((cast(nonspace as bigint) * 1000000) div n_tok, " +
              "8000000L) div 8")).otherwise(0L).as("avg_ppm"))
        .withColumn("score_micro",
          expr("3 * ttr_ppm + 2 * len_ppm + avg_ppm"))
        .withColumn("verdict",
          when(col("score_micro") >= 3300000L, "keep").otherwise("drop"))
    }),

    // PII audit report: per-source counts of documents and hits per PII
    // class (emails, NANP-style phone numbers) plus a ppm exposure share
    // — the compliance sibling of q_redact (which rewrites; this one
    // REPORTS, the artifact a pipeline publishes before deciding what to
    // redact). The fixture corpus is digit-free, so PII is PLANTED
    // deterministically from doc_id (same fixture discipline as the
    // dedup family's planted copies): every 7th doc gains an email,
    // every 11th a phone number. Detection is regexp_extract_all over
    // the text — one map-side pass, then one dim-sized partial+final
    // aggregate; at 100 TB the regex scan dominates and parallelizes
    // perfectly.
    "q_pii_scan" -> ((s, d) => {
      val withPii = Tables.documents(s, d).select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phoneRe = "555-[0-9]{3}-[0-9]{4}"
      withPii
        .select(col("source"),
          size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
            .as("n_email"),
          size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
            .as("n_phone"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_email") > 0, 1L).otherwise(0L)).as("docs_email"),
          sum(col("n_email")).cast("long").as("email_hits"),
          sum(when(col("n_phone") > 0, 1L).otherwise(0L)).as("docs_phone"),
          sum(col("n_phone")).cast("long").as("phone_hits"),
          sum(when(col("n_email") > 0 || col("n_phone") > 0, 1L)
            .otherwise(0L)).as("docs_any"))
        .select(col("source"), col("n_docs"), col("docs_email"),
          col("email_hits"), col("docs_phone"), col("phone_hits"),
          expr("(docs_any * 1000000) div n_docs").as("pii_docs_ppm"))
    }),

    // Repetition scoring (the Gopher/C4-style templated-text signal):
    // duplicate-bigram share (1 - distinct/total) and the share of the
    // single most repeated bigram, per doc. Unlike the quality HOFs this
    // needs occurrence COUNTS, so bigrams explode into two partial+final
    // aggregates keyed on (doc_id, bigram) then doc_id — the hapax shape
    // at document granularity; nothing bigger than (id, gram, count)
    // shuffles. max/sum/count are integer-exact, shares rounded at the end.
    "q_repetition" -> ((s, d) => {
      val toks = filter(split(col("text"), " "), t => t =!= "")
      val bigrams = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ts) - 1), i -> concat(ts[i-1], ' ', ts[i]))"))
          .as("bg"))
      bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("distinct_bg"),
          max(col("n")).as("top_n"))
        .select(col("doc_id"),
          col("total").as("n_bigrams"),
          // floor(x*1e4+0.5)/1e4, not round(): n/total ratios land exactly
          // on .xxxx5 (1/32 = 0.03125) where the engines' tie rules differ
          (floor((lit(1.0) - col("distinct_bg") / col("total")) * lit(10000)
            + lit(0.5)) / lit(10000)).as("dup_share"),
          (floor(col("top_n") / col("total") * lit(10000) + lit(0.5))
            / lit(10000)).as("top_share"))
    }),

    "q_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        substring(TextFunctions.fingerprint(col("text")), 1, 8).as("fp8"))),

    "q_multimodal" -> ((s, d) =>
      Multimodal.extractFeatures(s, Tables.documents(s, d)).toDF()),

    "q_mm_frames" -> ((s, d) =>
      Multimodal.sampleFrames(s, Tables.documents(s, d),
        frameSize = 256, step = 4).toDF()),

    "q_mm_resize" -> ((s, d) =>
      Multimodal.resizeMedia(s, Tables.documents(s, d)).toDF()),

    // ---- unicode text cleaning: NFC canonical composition (native
    // expression — Spark ships no normalize function), zero-width /
    // control-char strip, NBSP unification, whitespace collapse, trim.
    // The fixtures are pure ASCII, so each doc gets a deterministic
    // DIRTY decoration first (combining accent, ZWSP, NBSP, tab runs,
    // BEL) that the oracle reproduces with chr() — the NFC composition
    // and every strip rule are then observable in the cleaned length
    // and tail. Pure map-side; scales with corpus bytes.
    "q_text_clean" -> ((s, d) => {
      val dirty = concat(col("text"),
        lit(" cafe"), lit("\u0301"), lit("\u200B"), lit("\u00A0"),
        lit("x"), lit("\t\t y"), lit("\u0007"))
      val cleaned = trim(regexp_replace(regexp_replace(regexp_replace(
        graft.expressions.NfcNormalize.nfcNormalize(dirty),
        "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}" +
          "\\x{007F}\\x{200B}-\\x{200D}\\x{FEFF}]", ""),
        "\u00A0", " "),
        "[ \t\n\r]+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), dirty.as("dirty"), cleaned.as("clean"))
        .select(col("doc_id"),
          length(col("dirty")).as("dirty_len"),
          length(col("clean")).as("clean_len"),
          expr("right(clean, 12)").as("tail"))
    }),

    // ---- markup/boilerplate strip: the HTML-ish cleanup every
    // web-corpus pipeline runs before tokenization (tag removal, URL
    // removal, whitespace collapse). The fixture text is clean prose,
    // so the markup is PLANTED deterministically (tag wrap + per-doc
    // URL + self-closing break) and then stripped — the oracle replays
    // the plant AND the strip, so every rule is value-checked against
    // the cleaned length and head, not just smoke-run. Pure map-side
    // regex; scales with corpus bytes.
    "q_text_strip_markup" -> ((s, d) => {
      val raw = concat(lit("<p class=\"doc\">"),
        coalesce(col("text"), lit("")),
        lit("</p> see https://ex.am/d/"), col("doc_id").cast("string"),
        lit(" <br/>"))
      val clean = trim(regexp_replace(regexp_replace(regexp_replace(raw,
        "<[^>]*>", " "),
        "https?://[^ ]+", " "),
        "[ \t\n\r]+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"), clean.as("clean"))
        .select(col("doc_id"),
          length(col("raw")).as("raw_len"),
          length(col("clean")).as("clean_len"),
          expr("substring(clean, 1, 40)").as("head"))
    }),

    // ---- BM25 retrieval scoring (Lucene form, k1=1.2, b=0.75): the
    // query set is the term multiset of docs 0-4; scoring is the
    // inverted-index join pattern (query terms -> postings), so work is
    // proportional to postings touched, never |queries| x |corpus|.
    // Portability: idf and each term score pass libm's ln once, are
    // floor-rounded to 6 dp immediately, and accumulate as EXACT
    // decimals (the tfidf precedent) — the final score is one double
    // division rounded to 3. Top-10 per query, total order.
    "q_bm25" -> ((s, d) => {
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * 1e6 + 0.5) / 1e6
      // work-vs-bytes: tokenize + tf partial-aggregate otherwise run in
      // the single-split fixture scan task (the q_lm_surprisal widen,
      // same rationale); pass-through on a wide lake scan
      val toks = Tables.widen(Tables.documents(s, d)
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf")).localCheckpoint()
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val g = dl.agg(sum(col("dl")).cast("double").as("t"),
        count(lit(1)).cast("double").as("n")).head()
      // empty corpus: sum is null and the formula never evaluates —
      // any finite placeholder keeps construction from NPEing
      val nDocs = g.getDouble(1)
      val avgdl = if (g.isNullAt(0) || nDocs == 0) 1.0
                  else g.getDouble(0) / nDocs
      val idf = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .select(col("tok"), r6(log(
          (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)).as("idf"))
      val q = tf.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"), col("tok")).distinct()
      // idf is VOCABULARY-sized (Heaps' law: it grows with the corpus,
      // hapax-heavy) — guarded broadcast with a shuffle_hash fallback,
      // never an unconditional hint (VERDICT r12 item 1)
      q.join(tf, "tok")
        .join(BroadcastGuard.dim(idf,
          length(col("tok")) + lit(8), "bm25 idf",
          // content-tagged key: in-place fixture regeneration must
          // invalidate the pinned dim, same contract as the plan key
          memoKey = Some(
            s"bm25-idf|${graft.sources.StandingIndex.tag(d, "documents")}")),
          "tok")
        .join(dl, "doc_id")
        .filter(col("doc_id") =!= col("qid"))
        .withColumn("term_score", r6(col("idf") * (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl)))
          .cast("decimal(18,6)"))
        .groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("term_score")).as("sc"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("sc").desc, col("doc_id"))))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("doc_id"),
          (floor(col("sc").cast("double") * 1e3 + 0.5) / 1e3).as("score"),
          col("rk"))
    }),

    // ---- bigram-LM surprisal (the CCNet-style LM quality filter,
    // made hash-exact): per-bigram surprisal is the INTEGER log2 ratio
    // floor(log2(ct(w1))) - floor(log2(ct(w1 w2))) = bitlen difference
    // — libm-free, so cross-engine sums are exact with no rounding
    // escape hatch. High sum/bigram ratio = text the corpus LM finds
    // surprising (the filter signal). The unigram table is VOCAB-sized
    // (Heaps-law growth) so it rides the guarded broadcast — measured
    // payload under the ceiling broadcasts, past it the join degrades
    // to shuffle_hash; the bigram table is corpus-scaled so it always
    // SHUFFLE-joins (broadcasting it would not survive 100x).
    "q_lm_surprisal" -> ((s, d) => {
      // work-vs-bytes: the bigram transform fans each doc into ~100
      // struct rows feeding the checkpoint — Tables.widen buys the
      // parallelism a bytes-split scan of the small corpus cannot see
      // (r12 profile: a 5.3 s single-task checkpoint stage)
      val docs = Tables.widen(Tables.documents(s, d)
          .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          expr("filter(split(text, ' '), x -> length(x) > 0)").as("arr"))
        // a 0/1-token doc has no bigram: without this guard
        // sequence(1, size-1) DESCENDS (Spark defaults step to -1 when
        // start > stop) and element_at(arr, 0) throws at runtime; the
        // end-exclusive oracle RANGE emits no rows for such docs
        .filter(size(col("arr")) >= 2)
      val bgs = docs.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "i -> struct(element_at(arr, i) as w1, " +
          "concat(element_at(arr, i), ' ', element_at(arr, i + 1)) as bg))"))
        .as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.bg"))
        .localCheckpoint()
      val uniCt = bgs.groupBy(col("w1")).agg(count(lit(1)).as("uc"))
      val bgCt = bgs.groupBy(col("bg")).agg(count(lit(1)).as("bc"))
      bgs.join(BroadcastGuard.dim(uniCt,
          length(col("w1")) + lit(8), "surprisal unigrams",
          memoKey = Some(s"surprisal-uni|${
            graft.sources.StandingIndex.tag(d, "documents")}")), "w1")
        .join(bgCt, "bg")
        .withColumn("surp",
          length(expr("bin(uc)")) - length(expr("bin(bc)")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("surp")).as("sum_surprisal"))
        .withColumn("avg_surprisal", floor(col("sum_surprisal") /
          col("n_bigrams").cast("double") * 1e4 + 0.5) / 1e4)
    }),

    // ---- temperature-scaled mixture weights (the multi-source
    // training-mix step: sample source s proportionally to n_s^alpha,
    // alpha=0.5, so small sources are up-weighted): weights live as
    // floor(sqrt(n)*10^6) BIGINTs — sqrt is correctly-rounded IEEE in
    // both engines, everything after is exact integer math, so the
    // per-source target counts hash-match. The grand total is ONE row
    // of a source-cardinality aggregate — the same deliberate dim-sized
    // driver round-trip the IVF centroid path makes (a constant-key
    // broadcast join would constant-fold into a BNLJ).
    "q_mixture_temp" -> ((s, d) => {
      val n = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .withColumn("w_scaled",
          floor(sqrt(col("n").cast("double")) * 1e6).cast("long"))
      val totRow = n.agg(sum(col("w_scaled"))).head()
      val totW = if (totRow.isNullAt(0)) 1L else totRow.getLong(0)
      n.select(col("source"), col("n"), col("w_scaled"),
        expr(s"(100000 * w_scaled) div ${totW}L").as("target_docs"))
    }),

    // ---- deterministic global shuffle + shard assignment (the
    // write-training-shards step): md5(doc_id) is the shuffle key, the
    // distributed prefix scan assigns the global position (no single-
    // partition window), and shards stripe round-robin over the
    // shuffled order. Fully deterministic across runs, partitionings,
    // and engines — re-running the pipeline reproduces every shard
    // byte-for-byte, the property a resumable 100 TB packing job needs.
    "q_shuffle_det" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("skey"))
      graft.operators.Prefix.rowNumber(docs,
          bucket = conv(substring(col("skey"), 1, 2), 16, 10).cast("long"),
          order = Seq(col("skey"), col("doc_id")), out = "rn")
        .select(col("doc_id"), col("skey"),
          ((col("rn") - 1) % 16).as("shard"),
          expr("(rn - 1) div 16").as("pos_in_shard"))
    }),

    // Overlapping token-window chunking — the standard pre-training /
    // RAG document-splitting step (32-token windows, stride 24 → 8-token
    // overlap). Pure map-side: split → posexplode over computed starts →
    // slice; no shuffle, scales linearly with corpus bytes.
    "q_text_chunks" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .withColumn("n_tok", size(col("toks")))
        .filter(col("n_tok") > 0)
      toks
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), col("n_tok") - 1, lit(CHUNK_STRIDE))))
        .select(col("doc_id"), col("pos").as("chunk_idx"),
          array_join(slice(col("toks"), col("col") + 1, lit(CHUNK_SIZE)), " ")
            .as("chunk_text"),
          size(slice(col("toks"), col("col") + 1, lit(CHUNK_SIZE)))
            .as("n_chunk_toks"))
    }),

    // PII-shaped cleaning: global regex redaction of numerics in the
    // payload plus salted-hash pseudonymization of the user key — both
    // pure map-side, replayable by any engine (no RNG).
    "q_redact" -> ((s, d) =>
      Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "<NUM>").as("props_red"),
          md5(concat(col("user_id").cast("string"), lit("pepper")))
            .as("user_pseudo"))),

    // Incremental corpus dedup: admit only the new-batch docs whose
    // fingerprint is NOT already in the standing corpus — the
    // every-ingest-cycle op of a training-data pipeline. One hash
    // exchange on the 16-byte fingerprint (never the text); within-batch
    // duplicates are q_dedup_exact's job, this is batch-vs-corpus.
    // ---- PERSISTED STANDING INDEX (VERDICT r13 item 1): build once,
    // serve many — the reference's own MOF+offset-index architecture
    // (src/MOFServer/IndexInfo.h:98-104). The near-dup index (bucketed
    // minhash bands / members / shingle sets) is built on first use and
    // every subsequent serve joins the NEW batch against it with zero
    // corpus re-shingling/re-signing (plan-asserted in
    // StandingIndexSpec); exact-Jaccard verification keeps the output
    // equal to the all-pairs oracle (the q_dedup_minhash argument).
    "q_dedup_incremental_near" -> ((s, d) =>
      graft.sources.StandingIndex.nearDupIncrement(s, d)),

    // Index MAINTENANCE: the same probe served from an index kept
    // current by APPENDING an increment (standing = doc_id%5∈{1,2},
    // appended = {3,4}) instead of rebuilding — append work is
    // proportional to the increment, and the maintained index must
    // answer exactly like a monolithic one over doc_id%5≠0 (the oracle
    // is q_dedup_incremental_near's).
    "q_index_append" -> ((s, d) =>
      graft.sources.StandingIndex.nearDupAppendServe(s, d)),

    // IVF serve from the persisted index: centroids parquet + cell-
    // partitioned assignments; a query probes nProbe cells and the scan
    // PRUNES to those directories (PartitionFilters) — recall-gated in
    // ACCURACY like the transient IVF path (float centroids are layout-
    // sensitive at build; the persisted serve is deterministic).
    "q_ann_persisted" -> ((s, d) =>
      graft.sources.StandingIndex.annServe(s, d)),

    // IVF index MAINTENANCE (VERDICT r14 item 2): the same serve
    // against an index whose generation 0 clustered the STANDING
    // vectors (vec_id%5 ∈ {1,2}) and whose increment ({3,4}) was
    // assigned to the FROZEN centroids and appended atomically (the
    // stage + hard-link + pointer-flip protocol — a crash at any step
    // leaves the committed generation serving, a re-run neither loses
    // nor duplicates rows). Centroid drift induced by the append is
    // measured and persisted in the generation meta; recall of the
    // appended index is driver-gated in ACCURACY at ≥ 0.85.
    "q_ann_index_append" -> ((s, d) =>
      graft.sources.StandingIndex.annAppendServe(s, d)),

    // URL/domain-grain dedup (r13 VERDICT stretch 7): the crawl-pipeline
    // pass that runs BEFORE content dedup — canonicalize each doc's URL
    // (strip scheme, leading www., query string, trailing slash; all
    // map-side codegen'd regexp_replace, one pass) and collapse at HOST
    // grain: per host, doc count, distinct canonical URLs, and the
    // keep-representative (min doc_id). The fixture has no url column,
    // so one is synthesized deterministically from (source, lang,
    // doc_id) — with www./query/trailing-slash noise planted by doc_id
    // residue classes — and the oracle replays the identical synthesis
    // + canonicalization, so the collapse itself is what is compared.
    // Plan shape: the exact distinct-URL count makes this the
    // TWO-exchange exact-distinct ladder — partial on (host, url),
    // exchange, dedup, re-exchange on host, final — with map-side
    // partials at both levels; a single-exchange variant exists only
    // by degrading to approx_count_distinct.
    "q_url_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 4 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example.org/"), col("lang"), lit("/p"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 7 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit("?utm_source=feed"))
          .otherwise(lit("")))
      val canon = regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(lower(url),
          "^https?://", ""), "^www\\.", ""), "\\?.*$", ""), "/$", "")
      docs
        .select(col("doc_id"), canon.as("url_canon"))
        .select(col("doc_id"), col("url_canon"),
          split(col("url_canon"), "/").getItem(0).as("host"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url_canon")).as("n_urls"),
          min(col("doc_id")).as("keep_id"))
    }),

    "q_dedup_incremental" -> ((s, d) => {
      val fp = Tables.documents(s, d)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
      val corpus = fp.filter(col("doc_id") % 5 =!= 0)
      val batch = fp.filter(col("doc_id") % 5 === 0)
      batch.join(corpus.select(col("fp")), Seq("fp"), "left_anti")
        .select(col("doc_id"), col("fp"))
    }),

    // Corpus composition report: doc/byte share per source — the mix
    // table on every dataset card. One partial+final aggregate; the
    // percentage denominator is a broadcast 1-row total (counted in the
    // same pass's output, not a second scan of the corpus).
    "q_source_mix" -> ((s, d) => {
      val bySource = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      val tot = bySource.agg(sum(col("n_docs")).as("tot"))
      bySource.crossJoin(broadcast(tot))
        .withColumn("pct",
          round(col("n_docs") * lit(100.0) / col("tot"), 2))
        .select(col("source"), col("n_docs"), col("n_chars"), col("pct"))
    }),

    // Train/eval contamination scan: an eval doc is contaminated if it
    // shares ANY 5-gram with any training doc (the benchmark-leakage
    // check run before every training set ships). Inverted-index
    // left-semi join on the shingle — the eval side short-circuits at
    // first match, nothing materializes the pair list.
    "q_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def grams(df: DataFrame) = df.select(col("doc_id"),
        explode(graft.expressions.TextExpressions
          .wordShingles(col("text"), 5)).as("g"))
      val evalSet = grams(docs.filter(col("doc_id") % 50 === 0))
      val trainSet = grams(docs.filter(col("doc_id") % 50 =!= 0))
      evalSet.join(trainSet.select(col("g")).distinct(), Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
    }),

    // Corpus collocations: top-20 bigrams by document frequency through
    // the native WordShingles expression (distinct per doc by
    // construction) — explode → partial+final count → TakeOrdered, with
    // a deterministic bigram tiebreak at the rank boundary.
    "q_ngrams_top" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(graft.expressions.TextExpressions
          .wordShingles(col("text"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("bigram")).limit(20)),

    // Corpus-statistic filtering: keep docs at or above the corpus
    // median quality — one tiny aggregate broadcast back over the
    // corpus, the standard "filter by global statistic" shape (never a
    // sort, never a driver collect). Scale note: EXACT median is safe
    // here only because quality is rounded to 3 decimals — Spark's
    // Percentile buffer is a value→count map merged map-side, so its
    // size is bounded by the ≤1001 distinct values, not corpus rows.
    // For unbounded-cardinality columns swap in percentile_approx
    // (see q_approx_percentile).
    "q_quality_filter" -> ((s, d) => {
      // the repartition is a materialization barrier: both consumers (the
      // median aggregate and the filter) read the SAME exchange via
      // ReuseExchange, so the HOF score expression evaluates once per doc
      // instead of once per branch — the shuffle moves only (doc_id,
      // quality), never the text
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
        .repartition(col("doc_id"))
      val med = docs.agg(median(col("quality")).as("med"))
      docs.crossJoin(broadcast(med))
        .filter(col("quality") >= col("med"))
        .select(col("doc_id"), col("quality"))
    }),

    // Deterministic per-group downsampling (≤20 docs per language) via
    // the custom GroupTopK operator ordered by a salted hash: the
    // partial pass caps every map task at k rows per group BEFORE the
    // exchange, so the shuffle moves ≤ k·maps rows per language instead
    // of the whole corpus — the rebalancing step that tames a
    // 95%-English crawl.
    "q_sample_group" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          md5(concat(col("doc_id").cast("string"), lit("gs"))).as("h"))
      graft.plans.GroupTopK.topKPerGroup(docs,
          Seq(col("lang")), Seq(col("h").asc), k = 20)
        .select(col("doc_id"), col("lang"))
    }),

    // Bloom-accelerated incremental dedup: build a Bloom filter over the
    // corpus fingerprints (distributed aggregate; the ~MB filter lands
    // on the driver like any broadcast side), pre-filter the batch map-
    // side, and send ONLY the might-contain remainder through the exact
    // anti-join. False positives are caught by the join, so the output
    // is exactly q_dedup_incremental's (same oracle) — the bloom just
    // keeps definitely-new docs out of the shuffle. At 10⁹ corpus keys /
    // 1% fpp the filter is ~1.2 GB: still broadcastable, or split into
    // per-range blooms. The probe is Catalyst's codegen'd
    // `BloomFilterMightContain` (the expression behind Spark's injected
    // runtime filters) over a serialized filter literal — it wants a
    // LONG probe value, so the bloom is built over xxhash64(fp) (putLong
    // on build, mightContainLong on probe: symmetric).
    "q_bloom_dedup" -> ((s, d) => {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      import org.apache.spark.sql.types.BinaryType
      val fp = Tables.documents(s, d)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
        .withColumn("fph", xxhash64(col("fp")))
      val corpus = fp.filter(col("doc_id") % 5 =!= 0)
      val batch = fp.filter(col("doc_id") % 5 === 0)
      // a bloom aggregated over ZERO rows comes back with null bits and
      // NPEs (the empty-increment run every scheduled pipeline hits); an
      // EMPTY corpus means "nothing is in the corpus", for which
      // mightContain ≡ false is exact, not approximate. Catch ONLY that
      // NPE — any other build failure on a non-empty corpus must
      // propagate, or the false-fallback would skip the exact anti-join
      // and silently emit corpus duplicates as new.
      val bfOpt = try {
        val b = corpus.stat.bloomFilter("fph", expectedNumItems = 100000L,
          fpp = 0.01)
        b.mightContainLong(0L); Some(b)
      } catch { case _: NullPointerException => None }
      val mightContain: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        bfOpt match {
          case Some(bf) =>
            val bos = new java.io.ByteArrayOutputStream()
            bf.writeTo(bos)
            val bytes = bos.toByteArray
            c => ColumnBridge.column(BloomFilterMightContain(
              Literal(bytes, BinaryType), ColumnBridge.expression(c)))
          case None => _ => lit(false)
        }
      batch.filter(!mightContain(col("fph")))
        .select(col("doc_id"), col("fp"))
        .union(
          batch.filter(mightContain(col("fph")))
            .join(corpus.select(col("fp")), Seq("fp"), "left_anti")
            .select(col("doc_id"), col("fp")))
    }),

    // Per-vector int8 scalar quantization (min/max affine): the 4×
    // storage/IO lever for 100 TB embedding corpora. Map-side only;
    // emits the full code array plus the mean reconstruction error so
    // the quality loss is part of the checked contract.
    "q_embed_quantize" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("mn", array_min(col("v")))
        .withColumn("mx", array_max(col("v")))
        // constant vector → range 0 → all codes 0, zero error (not NaN)
        .withColumn("rng", when(col("mx") === col("mn"), lit(1.0))
          .otherwise(col("mx") - col("mn")))
      e.select(col("vec_id"),
        array_join(transform(col("v"), x =>
          round((x - col("mn")) * lit(255.0) / col("rng"))
            .cast("int")), ",").as("codes"),
        round(aggregate(col("v"), lit(0.0d), (acc, x) =>
          acc + abs(x - (round((x - col("mn")) * lit(255.0) / col("rng"))
            * col("rng") / lit(255.0) + col("mn")))) / lit(EMBED_DIM.toDouble), 4)
          .as("recon_err"))
    }),

    // Flagship end-to-end training-data prep: quality gate → exact
    // dedup (lowest doc_id survives, via the same partial+final
    // GroupTopK operator with k=1 — a dedup is just a group-cap on the
    // fingerprint) → overlapping chunking. One pipeline, three
    // exchanges max (fingerprint cap; everything else is map-side),
    // demonstrating the operators compose without materialization.
    "q_pipeline" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"),
          md5(lower(trim(col("text")))).as("fp"))
        .filter(col("quality") >= 0.5)
      val kept = graft.plans.GroupTopK.topKPerGroup(scored,
        Seq(col("fp")), Seq(col("doc_id").asc), k = 1)
      val toks = kept
        .select(col("doc_id"), col("quality"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .withColumn("n_tok", size(col("toks")))
        .filter(col("n_tok") > 0)
      toks
        .select(col("doc_id"), col("quality"), col("toks"),
          posexplode(sequence(lit(0), col("n_tok") - 1, lit(CHUNK_STRIDE))))
        .select(col("doc_id"), col("quality"), col("pos").as("chunk_idx"),
          array_join(slice(col("toks"), col("col") + 1, lit(CHUNK_SIZE)), " ")
            .as("chunk_text"))
    }),

    // Leakage-safe train/val/test split: assignment is BY DUPLICATE
    // CLUSTER, not by document — near-duplicates (minhash pairs at
    // J >= 0.9, transitively closed) always land in the same split, so
    // evaluation never sees a near-copy of a training document (the
    // contamination mode a plain per-doc hash split silently allows).
    // Composition of the existing dupClusters operator with the
    // deterministic md5 assignment rule (replayable in any engine);
    // docs in no near-dup pair are their own singleton group. ~80/10/10
    // via 2-hex-digit thresholds (cc=204/256, e6=230/256).
    "q_split_leakage_safe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9)
      val clusters = graft.dedup.Clusters.dupClusters(pairs, "doc_a", "doc_b")
      val withGroup = docs.select(col("doc_id"))
        .join(clusters.select(col("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
      val h = substring(
        md5(concat(col("group_id").cast("string"), lit("split1"))), 1, 2)
      withGroup
        .withColumn("split",
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
        .select(col("doc_id"), col("group_id"), col("split"))
    }),

    // ---- COMPOSED dedup pipeline — the shape a real 100 TB pipeline
    // runs. The near-dup pair table (shingle → 64 minhashes → band join
    // → exact-Jaccard verification: by far the dominant cost) is
    // computed ONCE and localCheckpoint'ed; duplicate clusters, the
    // keep/drop list and the leakage-safe split all derive from that
    // one materialization — where the standalone queries
    // (q_dup_clusters / q_dedup_keep_best / q_split_leakage_safe) each
    // recompute the pairs from scratch (correct per-query isolation,
    // 3× the pair cost). One row per corpus document: cluster label,
    // FULL-corpus cluster size (singletons = 1 — dupClusters' size
    // counts paired docs only), representative flag (longest copy,
    // ties to the lowest id) and the md5-by-cluster split, so near-
    // duplicates always share a split. PipelineDedupSpec asserts the
    // executed plan carries no shingle/minhash machinery downstream of
    // the checkpoint — the pair stage ran exactly once.
    "q_dedup_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9)
        .localCheckpoint()
      val cc = graft.dedup.Clusters
        .connectedComponents(pairs, "doc_a", "doc_b")
      // (doc_id, n_chars, cluster_id) is shared by the size aggregate,
      // the representative window and the split projection; checkpoint
      // it once so those branches re-read a materialized slim table
      // instead of re-running the label join per branch
      val labeled = docs.select(col("doc_id"), col("n_chars"))
        .join(cc.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
        .select(col("doc_id"), col("n_chars"), col("cluster_id"))
        .localCheckpoint()
      val sizes = labeled.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val h = substring(
        md5(concat(col("cluster_id").cast("string"), lit("split1"))), 1, 2)
      labeled
        .withColumn("keep", row_number().over(w) === 1)
        .join(sizes, "cluster_id")
        .withColumn("split",
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("keep"), col("split"))
    }),

    // ---- FULL ingest-to-ship pipeline (r11 VERDICT stretch item 6):
    // q_dedup_pipeline's shared-pair-table shape EXTENDED through the
    // contamination gate — the five steps a training-data run ships
    // through (near-dup pairs → duplicate clusters → keep/drop list →
    // leakage-safe split → residual-contamination scan), as ONE
    // measured plan. The expensive stages each run exactly once:
    //  * the minhash pair table is checkpointed once (as in
    //    q_dedup_pipeline) and feeds clustering;
    //  * the per-doc assignment (cluster, size, keep, split) is
    //    checkpointed once and feeds BOTH sides of the contamination
    //    join and the final projection;
    //  * the contamination gate then asks the question the cluster-level
    //    split can NOT answer by construction: near-duplicates always
    //    share a split, but an eval (val/test) doc can still share exact
    //    5-grams with a SHIPPED train doc (keep = true) below the 0.9
    //    Jaccard radius — boilerplate, quoted passages. Inverted-index
    //    left-semi join on the 5-gram (the q_contamination shape): the
    //    shuffle moves (gram, doc_id), nothing materializes a pair list.
    // Output: one row per corpus doc — cluster label, full-corpus
    // cluster size, representative flag, split, contaminated flag
    // (always false for train docs: they ARE the reference set).
    "q_pipeline_full" -> ((s, d) => {
      val (docs, assigned) = pipelineAssignment(s, d)
      // ONE split-keyed gram table for both sides of the gate (r12
      // VERDICT note 3): the 5-gram explode runs once, crosses one
      // g-keyed exchange, and is MATERIALIZED there — per-consumer
      // filter pushdown would otherwise specialize the exchange subtree
      // per branch and defeat ReuseExchange (measured: two shingle
      // subtrees survive in the static plan without the checkpoint).
      // localCheckpoint preserves the hash(g) partitioning, so the
      // distinct-by-g and the left-semi downstream need NO further
      // exchange. Dropped train docs never shingle (they are neither
      // reference set nor probe). The materialized gram is the 64-bit
      // xxhash64 of the gram TEXT (r13 VERDICT item 5): the gate only
      // ever tests gram EQUALITY, so an 8-byte key carries the same
      // information as the ~40-byte text through the exchange, the
      // checkpoint, and the distinct's hash maps — an ~8× narrower
      // materialization at cluster scale. A 2⁻⁶⁴-per-pair hash merge is
      // the accepted error class (the minhash gk argument); the oracle
      // still replays TEXT grams, so the driver compare is itself the
      // hashed-vs-text differential.
      val gramTbl = assigned
        .filter(col("split") =!= "train" || col("keep"))
        .select(col("doc_id"), col("split"), col("keep"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("split"), col("keep"),
          explode(graft.expressions.TextExpressions
            .wordShingles(col("text"), 5)).as("gtxt"))
        .select(col("doc_id"), col("split"), col("keep"),
          xxhash64(col("gtxt")).as("g"))
        .repartition(col("g"))
        .localCheckpoint()
      val trainGrams = gramTbl
        .filter(col("split") === "train" && col("keep"))
        .select(col("g")).distinct()
      val contaminated = gramTbl.filter(col("split") =!= "train")
        .select(col("doc_id"), col("g"))
        .join(trainGrams, Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(true))
      assigned.join(contaminated, Seq("doc_id"), "left")
        .withColumn("contaminated", coalesce(col("hit"), lit(false)))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("keep"), col("split"), col("contaminated"))
    }),

    // ---- pipeline SHIP REPORT (r12 VERDICT item 4): the dataset-card
    // numbers a training-data run publishes with its shards, derived
    // from the SAME composed plan as q_pipeline_full — minhash pair
    // table and per-doc assignment each checkpointed once — plus ONE
    // full-corpus gram table behind a single g-keyed exchange that ALL
    // gram consumers reuse (trainGram set, eval contamination probe,
    // per-source distinct-gram census): q_contamination's and
    // q_source_overlap's semantics absorbed into the pipeline as two
    // more consumers of work it already does. Long-format output, one
    // row per statistic:
    //   ship          | split    |       | kept docs   | keep ratio
    //   contamination | split    |       | contam docs | contam rate
    //   overlap       | source a | src b | shared grams| overlap coeff
    // PipelineReportSpec differential-tests the overlap rows against
    // standalone q_source_overlap and the contamination counts against
    // q_pipeline_full's per-doc flags, and asserts the gram stage runs
    // once (a single WordShingles subtree feeding a reused exchange).
    "q_pipeline_report" -> ((s, d) => {
      val (docs, assigned) = pipelineAssignment(s, d)
      // the one gram table: FULL corpus (the overlap census needs every
      // doc, dropped copies included), carrying the consumer keys
      // (split, keep, source) so each of the THREE gram consumers is a
      // filter over one hash(g)-partitioned materialization, never a
      // re-shingle; grams ride as 64-bit hashes, not text (see
      // q_pipeline_full's checkpoint note — all three consumers test
      // equality only, and the overlap census counts distinct keys)
      val gramTbl = assigned
        .join(docs.select(col("doc_id"), col("source"), col("text")),
          Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("split"), col("keep"),
          explode(graft.expressions.TextExpressions
            .wordShingles(col("text"), 5)).as("gtxt"))
        .select(col("doc_id"), col("source"), col("split"), col("keep"),
          xxhash64(col("gtxt")).as("g"))
        .repartition(col("g"))
        .localCheckpoint()
      val trainGrams = gramTbl
        .filter(col("split") === "train" && col("keep"))
        .select(col("g")).distinct()
      val contamBySplit = gramTbl.filter(col("split") =!= "train")
        .select(col("doc_id"), col("split"), col("g"))
        .join(trainGrams, Seq("g"), "left_semi")
        .select(col("doc_id"), col("split")).distinct()
        .groupBy(col("split")).agg(count(lit(1)).as("n_contam"))
      // integer-exact portable rounding (floor(x·10^4 + 0.5)/10^4 — the
      // repo-wide tie rule) over pure count ratios: both engines do the
      // same two IEEE ops in the same order
      def r4(c: org.apache.spark.sql.Column) = floor(c * 1e4 + 0.5) / 1e4
      val ship = assigned.groupBy(col("split"))
        .agg(count(when(col("keep"), lit(1))).as("n"),
          count(lit(1)).as("n_docs"))
        .select(lit("ship").as("kind"), col("split").as("key_a"),
          lit("").as("key_b"), col("n"),
          r4(col("n") * lit(1.0) / col("n_docs")).as("metric"))
      val contam = assigned.filter(col("split") =!= "train")
        .groupBy(col("split")).agg(count(lit(1)).as("n_split"))
        .join(contamBySplit, Seq("split"), "left")
        .select(lit("contamination").as("kind"), col("split").as("key_a"),
          lit("").as("key_b"),
          coalesce(col("n_contam"), lit(0L)).as("n"),
          r4(coalesce(col("n_contam"), lit(0L)) * lit(1.0) / col("n_split"))
            .as("metric"))
      // the q_source_overlap shape, reading the shared gram exchange:
      // distinct (source, gram) census → per-source sizes (a tiny dim)
      // → gram-keyed self-join → per-pair overlap coefficient
      val srcGrams = gramTbl.select(col("source"), col("g")).distinct()
      val szs = srcGrams.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val withSz = srcGrams.join(broadcast(szs), "source")
      val overlap = withSz
        .select(col("g"), col("source").as("src_a"), col("sz").as("sz_a"))
        .join(withSz.select(col("g"), col("source").as("src_b"),
          col("sz").as("sz_b")), "g")
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n"),
          first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
        .select(lit("overlap").as("kind"), col("src_a").as("key_a"),
          col("src_b").as("key_b"), col("n"),
          round(col("n") / least(col("sz_a"), col("sz_b")), 4).as("metric"))
      ship.unionAll(contam).unionAll(overlap)
    }),

    // Mixture rebalancing: deterministically downsample each language to
    // an EQUAL share of the corpus (keep fraction min(1, T/(k·n_s));
    // the fixture's en is ~2.2x oversampled, the rest keep everything) —
    // the canonical "don't let the dominant slice drown the tail" step
    // of a training-data pipeline. The keep decision is a pure-INTEGER
    // comparison (h16·k·n_s < 65536·T, rendered as 5-hex-digit string
    // compares) so any engine replays it bit-exactly — no float
    // thresholds to drift across engines. Per-source counts are a tiny
    // broadcast dim; the corpus is filtered map-side in one pass.
    "q_mix_rebalance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val perLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_src"))
      val totals = docs.agg(count(lit(1)).as("total"))
        .crossJoin(perLang.agg(count(lit(1)).as("n_sources")))
      val h5 = concat(lit("0"), substring(
        md5(concat(col("doc_id").cast("string"), lit("mix1"))), 1, 4))
      docs.join(broadcast(perLang), "lang")
        .crossJoin(broadcast(totals))
        // DIV (not /) — double division + cast can land one off the
        // exact integer quotient and flip a threshold row vs the oracle
        .withColumn("thr", lpad(lower(hex(least(
          expr("(65536 * total) DIV (n_sources * n_src)"),
          lit(65536L)))), 5, "0"))
        .filter(h5 < col("thr"))
        .select(col("doc_id"), col("lang"))
    }),

    // TF-IDF: two corpus-wide aggregates (term frequency per doc,
    // document frequency per term) + a GUARDED broadcast join-back of
    // the DF table — vocabulary-sized, so the measured-payload guard
    // decides broadcast vs shuffle_hash (VERDICT r12 item 1); the
    // fact-side token stream shuffles exactly once (the tf groupBy);
    // the corpus-size aggregate is a one-row dim. Output is capped to
    // doc_id < 100, but DF/IDF are computed over the FULL corpus (the
    // cap filters the tf side only).
    "q_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = docs.select(count(lit(1)).as("n_docs"))
      tf.filter(col("doc_id") < 100)
        .join(BroadcastGuard.dim(dfreq,
          length(col("tok")) + lit(8), "tfidf df"), "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 3))
        .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("tfidf"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(lower(trim(text)))""".stripMargin,

    "q_dedup_minhash" -> jaccardOracle(0.9),
    "q_ngram_jaccard" -> jaccardOracle(0.8),

    // identical url synthesis + canonicalization chain, replayed in SQL
    "q_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CONCAT('https://',
        |      CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END,
        |      source, '.example.org/', lang, '/p',
        |      CAST(doc_id % 50 AS VARCHAR),
        |      CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END,
        |      CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' ELSE '' END)
        |      AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
        |      LOWER(url),
        |      '^https?://', ''), '^www\.', ''), '\?.*$', ''), '/$', '')
        |      AS url_canon
        |  FROM u)
        |SELECT SPLIT_PART(url_canon, '/', 1) AS host,
        |  COUNT(*) AS n_docs,
        |  COUNT(DISTINCT url_canon) AS n_urls,
        |  MIN(doc_id) AS keep_id
        |FROM c GROUP BY 1""".stripMargin,

    // exact batch(doc_id%5=0) × standing-corpus(doc_id%5≠0) Jaccard —
    // the persisted-index serve must reproduce the all-pairs answer
    // restricted to cross-split pairs (same LSH+exact-verify recall
    // argument as q_dedup_minhash)
    "q_dedup_incremental_near" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
        |       FROM d WHERE LEN(ts) >= 3)
        |SELECT b.doc_id AS doc_id, a.doc_id AS dup_id,
        |  ROUND(LEN(LIST_INTERSECT(b.s, a.s))
        |    / (LEN(b.s) + LEN(a.s) - LEN(LIST_INTERSECT(b.s, a.s))), 3) AS jaccard
        |FROM sh b JOIN sh a
        |  ON b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
        |WHERE LEN(LIST_INTERSECT(b.s, a.s))
        |    / (LEN(b.s) + LEN(a.s) - LEN(LIST_INTERSECT(b.s, a.s))) >= 0.9""".stripMargin,

    // the append-maintained index must answer IDENTICALLY to the
    // monolithic one — deliberately the same oracle as
    // q_dedup_incremental_near (that equality is the maintenance
    // contract under test)
    "q_index_append" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
        |       FROM d WHERE LEN(ts) >= 3)
        |SELECT b.doc_id AS doc_id, a.doc_id AS dup_id,
        |  ROUND(LEN(LIST_INTERSECT(b.s, a.s))
        |    / (LEN(b.s) + LEN(a.s) - LEN(LIST_INTERSECT(b.s, a.s))), 3) AS jaccard
        |FROM sh b JOIN sh a
        |  ON b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
        |WHERE LEN(LIST_INTERSECT(b.s, a.s))
        |    / (LEN(b.s) + LEN(a.s) - LEN(LIST_INTERSECT(b.s, a.s))) >= 0.9""".stripMargin,

    // Full signature replay: SimHash64's token hash is DuckDB's
    // md5_number_lower by construction (MD5 digest bytes 8..15
    // little-endian), so the oracle recomputes every 64-bit signature
    // from the raw text, replays the 16-bit-chunk blocking (signed >>
    // then mask — same as Spark's shiftright + AND), and the pair set
    // must hash-match bit-for-bit. The b=63 CASE assembles the sign
    // bit without overflowing signed BIGINT.
    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, t
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |        FROM documents)
        |  WHERE len(t) > 0
        |),
        |bits AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN (md5_number_lower(t) >> b) & 1 = 1
        |                  THEN 1 ELSE 0 END) AS ones,
        |         count(*) AS n
        |  FROM toks CROSS JOIN range(64) r(b)
        |  GROUP BY doc_id, b
        |),
        |sig AS (
        |  SELECT doc_id,
        |         sum(CASE WHEN 2*ones > n THEN
        |               CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                    ELSE (1::BIGINT << b) END
        |             ELSE 0 END)::BIGINT AS simhash
        |  FROM bits GROUP BY doc_id
        |),
        |chunks AS (
        |  SELECT doc_id, simhash, c, (simhash >> (c*16)::INT) & 65535 AS ck
        |  FROM sig CROSS JOIN range(4) r(c)
        |),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM chunks a
        |  JOIN chunks b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3""".stripMargin,

    // Transitive closure over the exact all-pairs Jaccard edges: comp =
    // min reachable doc id (DuckDB recursive CTE with set-union
    // semantics terminates at the fixpoint).
    "q_dup_clusters" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT id AS doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM comp""".stripMargin,

    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, cluster_id,
         |  ROW_NUMBER() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
         |FROM (SELECT dd.doc_id, COALESCE(c.cluster_id, dd.doc_id) AS cluster_id,
         |        dd.n_chars
         |      FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id)""".stripMargin,

    "q_mix_rebalance" ->
      """WITH s AS (SELECT lang, COUNT(*) AS n_src FROM documents GROUP BY lang),
        |t AS (SELECT (SELECT COUNT(*) FROM documents) AS total,
        |             (SELECT COUNT(*) FROM s) AS n_sources)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN s USING (lang) CROSS JOIN t
        |WHERE CONCAT('0', SUBSTRING(md5(CONCAT(CAST(d.doc_id AS VARCHAR), 'mix1')), 1, 4))
        |  < printf('%05x', LEAST((65536 * total) // (n_sources * n_src), 65536))""".stripMargin,

    "q_split_leakage_safe" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |g AS (SELECT doc_id, COALESCE(c.cluster_id, doc_id) AS group_id
         |      FROM documents LEFT JOIN comp c ON documents.doc_id = c.id)
         |SELECT doc_id, group_id,
         |  CASE WHEN SUBSTRING(md5(CONCAT(CAST(group_id AS VARCHAR), 'split1')), 1, 2) < 'cc'
         |         THEN 'train'
         |       WHEN SUBSTRING(md5(CONCAT(CAST(group_id AS VARCHAR), 'split1')), 1, 2) < 'e6'
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |FROM g""".stripMargin,

    // the composed pipeline: same closure CTE, then size / keep / split
    // all off the one full-corpus labeling (singletons label themselves)
    "q_dedup_pipeline" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |g AS (SELECT dd.doc_id, COALESCE(c.cluster_id, dd.doc_id) AS cluster_id,
         |        dd.n_chars
         |      FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id)
         |SELECT doc_id, cluster_id,
         |  COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  ROW_NUMBER() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep,
         |  CASE WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'cc'
         |         THEN 'train'
         |       WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'e6'
         |         THEN 'val'
         |       ELSE 'test' END AS split
         |FROM g""".stripMargin,

    // the FULL pipeline: the composed-pipeline closure/size/keep/split
    // replay extended by the residual-contamination scan — an eval
    // (val/test) doc is contaminated iff it shares any exact 5-gram
    // with a KEPT train doc (the q_contamination 5-gram replay scoped
    // to the pipeline's own shipped set)
    "q_pipeline_full" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |g AS (SELECT dd.doc_id, COALESCE(c.cluster_id, dd.doc_id) AS cluster_id,
         |        dd.n_chars
         |      FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id),
         |asg AS (
         |  SELECT doc_id, cluster_id,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep,
         |    CASE WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'cc'
         |           THEN 'train'
         |         WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'e6'
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM g),
         |g5 AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+4], ' ') FOR i IN RANGE(1, LEN(ts)-3)]) AS s
         |       FROM d WHERE LEN(ts) >= 5),
         |tg AS (SELECT DISTINCT UNNEST(g5.s) AS gr
         |       FROM g5 JOIN asg USING (doc_id)
         |       WHERE asg.split = 'train' AND asg.keep),
         |ev AS (SELECT g5.doc_id, UNNEST(g5.s) AS gr
         |       FROM g5 JOIN asg USING (doc_id)
         |       WHERE asg.split <> 'train'),
         |cont AS (SELECT DISTINCT doc_id FROM ev JOIN tg USING (gr))
         |SELECT asg.doc_id, asg.cluster_id, asg.cluster_size, asg.keep,
         |  asg.split, cont.doc_id IS NOT NULL AS contaminated
         |FROM asg LEFT JOIN cont ON cont.doc_id = asg.doc_id""".stripMargin,

    // the ship-report oracle replays the same recursive-CTE cluster
    // assignment, then derives the three report sections from one
    // 5-gram CTE — mirroring the Spark plan's single gram table. The
    // ratio rounding mirrors the Spark op order exactly
    // ((n * 1.0 / m) * 10000) so the IEEE doubles are bit-identical
    // before the floor.
    "q_pipeline_report" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
         |       FROM d WHERE LEN(ts) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS u, b.doc_id AS v
         |  FROM sh a, sh b
         |  WHERE a.doc_id < b.doc_id
         |    AND LEN(LIST_INTERSECT(a.s, b.s))
         |      / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= 0.9),
         |edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
         |reach(id, r) AS (
         |  SELECT u AS id, u AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |g AS (SELECT dd.doc_id, COALESCE(c.cluster_id, dd.doc_id) AS cluster_id,
         |        dd.n_chars
         |      FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id),
         |asg AS (
         |  SELECT doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep,
         |    CASE WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'cc'
         |           THEN 'train'
         |         WHEN SUBSTRING(md5(CONCAT(CAST(cluster_id AS VARCHAR), 'split1')), 1, 2) < 'e6'
         |           THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM g),
         |g5 AS (SELECT doc_id, source,
         |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+4], ' ') FOR i IN RANGE(1, LEN(ts)-3)]) AS s
         |       FROM d WHERE LEN(ts) >= 5),
         |tg AS (SELECT DISTINCT UNNEST(g5.s) AS gr
         |       FROM g5 JOIN asg USING (doc_id)
         |       WHERE asg.split = 'train' AND asg.keep),
         |ev AS (SELECT g5.doc_id, asg.split, UNNEST(g5.s) AS gr
         |       FROM g5 JOIN asg USING (doc_id)
         |       WHERE asg.split <> 'train'),
         |contd AS (SELECT DISTINCT doc_id, split FROM ev JOIN tg USING (gr)),
         |contn AS (SELECT split, COUNT(*) AS n FROM contd GROUP BY 1),
         |evn AS (SELECT split, COUNT(*) AS n_split FROM asg
         |        WHERE split <> 'train' GROUP BY 1),
         |gsrc AS (SELECT DISTINCT source, UNNEST(s) AS gr FROM g5),
         |sz AS (SELECT source, COUNT(*) AS sz FROM gsrc GROUP BY 1),
         |ship AS (
         |  SELECT 'ship' AS kind, split AS key_a, '' AS key_b,
         |    COUNT(*) FILTER (WHERE keep) AS n,
         |    FLOOR(COUNT(*) FILTER (WHERE keep) * 1.0 / COUNT(*) * 10000 + 0.5)
         |      / 10000 AS metric
         |  FROM asg GROUP BY split),
         |controws AS (
         |  SELECT 'contamination' AS kind, evn.split AS key_a, '' AS key_b,
         |    COALESCE(contn.n, 0) AS n,
         |    FLOOR(COALESCE(contn.n, 0) * 1.0 / evn.n_split * 10000 + 0.5)
         |      / 10000 AS metric
         |  FROM evn LEFT JOIN contn ON contn.split = evn.split),
         |ovl AS (
         |  SELECT 'overlap' AS kind, a.source AS key_a, b.source AS key_b,
         |    COUNT(*) AS n,
         |    ROUND(CAST(COUNT(*) AS DOUBLE) / LEAST(MIN(sa.sz), MIN(sb.sz)), 4) AS metric
         |  FROM gsrc a JOIN gsrc b ON a.gr = b.gr AND a.source < b.source
         |  JOIN sz sa ON sa.source = a.source
         |  JOIN sz sb ON sb.source = b.source
         |  GROUP BY 2, 3)
         |SELECT kind, key_a, key_b, CAST(n AS BIGINT) AS n, metric FROM ship
         |UNION ALL SELECT kind, key_a, key_b, CAST(n AS BIGINT), metric FROM controws
         |UNION ALL SELECT kind, key_a, key_b, CAST(n AS BIGINT), metric FROM ovl""".stripMargin,

    "q_dedup_embed" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |aug AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000000, LIST_TRANSFORM(v, x -> x * 0.5)
        |  FROM base WHERE vec_id % 50 = 0
        |  UNION ALL
        |  SELECT vec_id + 20000000, LIST_CONCAT([v[1] * 0.8], v[2:])
        |  FROM base WHERE vec_id % 50 = 1)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 3) AS cos_sim
        |FROM aug a, aug b
        |WHERE a.vec_id < b.vec_id
        |  AND ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 3) >= 0.9""".stripMargin,

    // semantic dedup: replay the adaptive cell count (k = max(4, n/256)),
    // the TWO-LEVEL assignment — m = ceil(sqrt(k)) coarse seeds (lowest
    // vec_ids), then each coarse cell's own f = ceil(k/m) lowest-vec_id
    // members as fine seeds; both levels argmax round-3 cosine with
    // ties to the smaller index; cell = coarse*f + fine — the planted
    // scaled copies, and the within-cell pair/drop bookkeeping
    "q_dedup_semantic" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |aug AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 10000000, LIST_TRANSFORM(v, x -> x * 0.5)
        |  FROM base WHERE vec_id % 50 = 0),
        |kk AS (SELECT GREATEST(4, COUNT(*) // 256) AS k FROM aug),
        |mm AS (SELECT CAST(CEIL(SQRT(k)) AS INT) AS m,
        |         CAST(CEIL(CAST(k AS DOUBLE) / CEIL(SQRT(k))) AS INT) AS f
        |       FROM kk),
        |c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
        |         AS cidx, v AS c
        |       FROM aug
        |       QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id)
        |         <= (SELECT m FROM mm)),
        |ca AS (SELECT vec_id, v, cidx AS coarse FROM (
        |  SELECT aug.vec_id, aug.v, c0.cidx,
        |    ROW_NUMBER() OVER (PARTITION BY aug.vec_id ORDER BY
        |      ROUND(LIST_COSINE_SIMILARITY(aug.v, c0.c), 3) DESC, c0.cidx)
        |      AS rk FROM aug, c0) WHERE rk = 1),
        |sub AS (SELECT coarse,
        |          CAST(ROW_NUMBER() OVER (PARTITION BY coarse
        |            ORDER BY vec_id) - 1 AS INT) AS fidx, v AS c
        |        FROM ca
        |        QUALIFY ROW_NUMBER() OVER (PARTITION BY coarse
        |          ORDER BY vec_id) <= (SELECT f FROM mm)),
        |a AS (SELECT vec_id, v,
        |        coarse * (SELECT f FROM mm) + fidx AS cell FROM (
        |  SELECT ca.vec_id, ca.v, ca.coarse, sub.fidx,
        |    ROW_NUMBER() OVER (PARTITION BY ca.vec_id ORDER BY
        |      ROUND(LIST_COSINE_SIMILARITY(ca.v, sub.c), 3) DESC, sub.fidx)
        |      AS rk FROM ca JOIN sub ON ca.coarse = sub.coarse)
        |  WHERE rk = 1),
        |p AS (SELECT x.cell, x.vec_id AS a, y.vec_id AS b
        |      FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |      WHERE ROUND(LIST_COSINE_SIMILARITY(x.v, y.v), 3) >= 0.95),
        |pc AS (SELECT cell, COUNT(*) AS n_dup_pairs FROM p GROUP BY cell),
        |dc AS (SELECT cell, COUNT(*) AS n_dropped FROM
        |       (SELECT DISTINCT cell, b FROM p) GROUP BY cell),
        |t AS (SELECT cell, COUNT(*) AS n_total FROM a GROUP BY cell)
        |SELECT t.cell, t.n_total,
        |  COALESCE(pc.n_dup_pairs, 0) AS n_dup_pairs,
        |  COALESCE(dc.n_dropped, 0) AS n_dropped,
        |  t.n_total - COALESCE(dc.n_dropped, 0) AS n_kept
        |FROM t LEFT JOIN pc USING (cell)
        |LEFT JOIN dc USING (cell)""".stripMargin,

    "q_dataset_card" ->
      """WITH g AS (SELECT source, lang, COUNT(*) AS n_docs,
        |             CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |           FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, total_chars,
        |  (total_chars * 1000000) // n_docs AS avg_chars_ppm,
        |  (n_docs * 1000000) //
        |    CAST((SELECT SUM(n_docs) FROM g) AS BIGINT) AS pct_docs_ppm
        |FROM g""".stripMargin,

    "q_outlier_embed" ->
      """WITH e AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT label, UNNEST(v) AS x,
        |    GENERATE_SUBSCRIPTS(v, 1) AS dim FROM e),
        |comp AS (SELECT label, dim, SUM(CAST(x AS DECIMAL(18,9))) AS sx
        |  FROM x GROUP BY label, dim),
        |cent AS (SELECT label, LIST(CAST(sx AS DOUBLE) ORDER BY dim) AS c
        |  FROM comp GROUP BY label),
        |s AS (SELECT e.vec_id, e.label,
        |    ROUND(LIST_COSINE_SIMILARITY(e.v, cent.c), 3) AS cos_c
        |  FROM e JOIN cent USING (label))
        |SELECT label, vec_id, cos_c FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY label
        |    ORDER BY cos_c, vec_id) AS rk FROM s) t
        |WHERE rk <= 5""".stripMargin,

    "q_ann_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |        ROUND(LIST_COSINE_SIMILARITY(q.v, c.v), 3) AS cos_sim
        |      FROM e q, e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT qid, nid, cos_sim, rk FROM (
        |  SELECT qid, nid, cos_sim,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |                       ORDER BY cos_sim DESC, nid) AS rk
        |  FROM s) t WHERE rk <= 5""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE SUBSTRING(md5(CONCAT(CAST(doc_id AS VARCHAR), 's1')), 1, 2)
        |  < CASE WHEN lang = 'en' THEN '20' ELSE '80' END""".stripMargin,

    "q_text_langid" ->
      """SELECT doc_id, lang,
        |  LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '')) AS n_tok,
        |  ROUND(CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '')) > 0
        |    THEN LEN(LIST_FILTER(STRING_SPLIT(text,' '),
        |           x -> x IN ('the','a','and','of','to')))
        |         / LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> ''))
        |    ELSE 0.0 END, 3) AS stop_ratio,
        |  CASE WHEN (CASE WHEN LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '')) > 0
        |    THEN LEN(LIST_FILTER(STRING_SPLIT(text,' '),
        |           x -> x IN ('the','a','and','of','to')))
        |         / LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> ''))
        |    ELSE 0.0 END) > 0.12 THEN 'en_like' ELSE 'other' END AS lang_guess
        |FROM documents""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    ROUND(0.3 * (CASE WHEN LEN(toks) > 0
        |        THEN LEN(LIST_DISTINCT(toks)) / LEN(toks) ELSE 0.0 END)
        |      + 0.3 * LEAST(1.0, n_chars / 500.0)
        |      + 0.4 * LEAST(1.0, (CASE WHEN LEN(toks) > 0
        |          THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
        |          ELSE 0.0 END) / 8.0), 3) AS quality
        |  FROM t)
        |SELECT doc_id, quality,
        |  CASE WHEN quality >= 0.5 THEN 'high' ELSE 'low' END AS band
        |FROM q""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '')) AS n_tok,
        |  LEN(LIST_DISTINCT(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> ''))) AS n_distinct,
        |  LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}|[0-9]{1,4}|[^a-z0-9\s]')) AS n_subwords
        |FROM documents""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        |  SUBSTRING(md5(lower(trim(text))), 1, 8) AS fp8
        |FROM documents""".stripMargin,

    "q_mm_frames" ->
      """WITH d AS (SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS blen, text
        |           FROM documents),
        |f AS (SELECT doc_id, blen, text,
        |        UNNEST(RANGE(0, GREATEST(1, (blen + 255) // 256), 4)) AS fi
        |      FROM d)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(GREATEST(LEAST(256, blen - fi * 256), 0) AS INT) AS frame_len,
        |  CAST(CASE WHEN blen - fi * 256 > 0
        |    THEN ORD(SUBSTRING(text, fi * 256 + 1, 1)) ELSE -1 END AS INT)
        |    AS first_byte
        |FROM f""".stripMargin,

    "q_repetition" ->
      """WITH d AS (SELECT doc_id,
        |             LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS ts
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         UNNEST([ts[i] || ' ' || ts[i+1] FOR i IN RANGE(1, LEN(ts))]) AS bg
        |       FROM d WHERE LEN(ts) >= 2),
        |c AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
        |  FLOOR((1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(n)) * 10000 + 0.5) / 10000
        |    AS dup_share,
        |  FLOOR(CAST(MAX(n) AS DOUBLE) / SUM(n) * 10000 + 0.5) / 10000
        |    AS top_share
        |FROM c GROUP BY doc_id""".stripMargin,

    "q_text_chunks" ->
      """WITH d AS (SELECT doc_id,
        |             LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '') AS ts
        |           FROM documents),
        |c AS (SELECT doc_id, ts, UNNEST(RANGE(0, LEN(ts), 24)) AS st
        |      FROM d WHERE LEN(ts) > 0)
        |SELECT doc_id, CAST(st // 24 AS INT) AS chunk_idx,
        |  ARRAY_TO_STRING(ts[st+1 : st+32], ' ') AS chunk_text,
        |  CAST(LEN(ts[st+1 : st+32]) AS INT) AS n_chunk_toks
        |FROM c""".stripMargin,

    "q_redact" ->
      """SELECT event_id,
        |  REGEXP_REPLACE(props, '[0-9]+', '<NUM>', 'g') AS props_red,
        |  md5(CONCAT(CAST(user_id AS VARCHAR), 'pepper')) AS user_pseudo
        |FROM events WHERE event_id < 2000""".stripMargin,

    "q_quality_model" ->
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |    LEN(LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '')) AS n_tok,
        |    LEN(LIST_DISTINCT(
        |      LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> ''))) AS n_distinct,
        |    LENGTH(REPLACE(text,' ','')) AS nonspace
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source,
        |    CASE WHEN n_tok > 0
        |      THEN (n_distinct * 1000000) // n_tok ELSE 0 END AS ttr_ppm,
        |    (LEAST(n_chars, 500) * 1000000) // 500 AS len_ppm,
        |    CASE WHEN n_tok > 0
        |      THEN LEAST((nonspace * 1000000) // n_tok, 8000000) // 8
        |      ELSE 0 END AS avg_ppm
        |  FROM t)
        |SELECT doc_id, source, ttr_ppm, len_ppm, avg_ppm,
        |  3 * ttr_ppm + 2 * len_ppm + avg_ppm AS score_micro,
        |  CASE WHEN 3 * ttr_ppm + 2 * len_ppm + avg_ppm >= 3300000
        |    THEN 'keep' ELSE 'drop' END AS verdict
        |FROM f""".stripMargin,

    "q_pii_scan" ->
      """WITH p AS (
        |  SELECT doc_id, source, text
        |    || (CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id
        |             || '@example.com' ELSE '' END)
        |    || (CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
        |             || LPAD(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |             || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |        ELSE '' END) AS text
        |  FROM documents),
        |h AS (
        |  SELECT source,
        |    LEN(REGEXP_EXTRACT_ALL(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email,
        |    LEN(REGEXP_EXTRACT_ALL(text, '555-[0-9]{3}-[0-9]{4}')) AS n_phone
        |  FROM p)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_email,
        |  CAST(SUM(n_email) AS BIGINT) AS email_hits,
        |  CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS docs_phone,
        |  CAST(SUM(n_phone) AS BIGINT) AS phone_hits,
        |  CAST((SUM(CASE WHEN n_email > 0 OR n_phone > 0 THEN 1 ELSE 0 END)
        |     * 1000000) // COUNT(*) AS BIGINT) AS pii_docs_ppm
        |FROM h GROUP BY source""".stripMargin,

    // identical contract to q_dedup_incremental — the bloom is an
    // execution accelerator, not a semantics change
    "q_bloom_dedup" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents b
        |WHERE doc_id % 5 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents c
        |  WHERE c.doc_id % 5 <> 0
        |    AND md5(lower(trim(c.text))) = md5(lower(trim(b.text))))""".stripMargin,

    "q_dedup_incremental" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents b
        |WHERE doc_id % 5 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents c
        |  WHERE c.doc_id % 5 <> 0
        |    AND md5(lower(trim(c.text))) = md5(lower(trim(b.text))))""".stripMargin,

    "q_source_mix" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM documents), 2) AS pct
        |FROM documents GROUP BY source""".stripMargin,

    "q_contamination" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+4], ' ')
        |                        FOR i IN RANGE(1, LEN(ts)-3)]) AS s
        |       FROM d WHERE LEN(ts) >= 5),
        |ev AS (SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id % 50 = 0),
        |cp AS (SELECT DISTINCT UNNEST(s) AS g FROM sh WHERE doc_id % 50 <> 0)
        |SELECT DISTINCT ev.doc_id FROM ev JOIN cp USING (g)""".stripMargin,

    "q_ngrams_top" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+1], ' ')
        |                        FOR i IN RANGE(1, LEN(ts))]) AS s
        |       FROM d WHERE LEN(ts) >= 2),
        |b AS (SELECT UNNEST(s) AS bigram FROM sh)
        |SELECT bigram, COUNT(*) AS df FROM b GROUP BY bigram
        |ORDER BY df DESC, bigram LIMIT 20""".stripMargin,

    "q_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, text, n_chars,
        |    LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, text, toks,
        |    ROUND(0.3 * (CASE WHEN LEN(toks) > 0
        |        THEN LEN(LIST_DISTINCT(toks)) / LEN(toks) ELSE 0.0 END)
        |      + 0.3 * LEAST(1.0, n_chars / 500.0)
        |      + 0.4 * LEAST(1.0, (CASE WHEN LEN(toks) > 0
        |          THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
        |          ELSE 0.0 END) / 8.0), 3) AS quality,
        |    md5(lower(trim(text))) AS fp
        |  FROM t),
        |passed AS (SELECT * FROM q WHERE quality >= 0.5),
        |kept AS (
        |  SELECT doc_id, quality, toks FROM (
        |    SELECT doc_id, quality, toks,
        |      ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        |    FROM passed) x WHERE rk = 1),
        |c AS (SELECT doc_id, quality, toks,
        |        UNNEST(RANGE(0, LEN(toks), 24)) AS st
        |      FROM kept WHERE LEN(toks) > 0)
        |SELECT doc_id, quality, CAST(st // 24 AS INT) AS chunk_idx,
        |  ARRAY_TO_STRING(toks[st+1 : st+32], ' ') AS chunk_text
        |FROM c""".stripMargin,

    "q_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    LIST_FILTER(STRING_SPLIT(text,' '), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    ROUND(0.3 * (CASE WHEN LEN(toks) > 0
        |        THEN LEN(LIST_DISTINCT(toks)) / LEN(toks) ELSE 0.0 END)
        |      + 0.3 * LEAST(1.0, n_chars / 500.0)
        |      + 0.4 * LEAST(1.0, (CASE WHEN LEN(toks) > 0
        |          THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
        |          ELSE 0.0 END) / 8.0), 3) AS quality
        |  FROM t)
        |SELECT doc_id, quality FROM q
        |WHERE quality >= (SELECT MEDIAN(quality) FROM q)""".stripMargin,

    "q_sample_group" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CONCAT(CAST(doc_id AS VARCHAR), 'gs'))) AS rk
        |  FROM documents) t
        |WHERE rk <= 20""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v, LIST_MIN(v) AS mn,
        |        CASE WHEN LIST_MAX(v) = LIST_MIN(v) THEN 1.0
        |             ELSE LIST_MAX(v) - LIST_MIN(v) END AS rng
        |      FROM e)
        |SELECT vec_id,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(v, x ->
        |    CAST(ROUND((x - mn) * 255.0 / rng) AS INT)), ',') AS codes,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(v, x ->
        |    ABS(x - (ROUND((x - mn) * 255.0 / rng)
        |             * rng / 255.0 + mn)))) / 64.0, 4) AS recon_err
        |FROM m""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |              FROM documents),
        |t AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |      WHERE tok <> '' GROUP BY doc_id, tok),
        |d AS (SELECT tok, COUNT(*) AS df FROM t GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT t.doc_id, t.tok, t.tf, d.df,
        |  ROUND(t.tf * LN(CAST(n_docs AS DOUBLE) / df), 3) AS tfidf
        |FROM t JOIN d USING (tok), n
        |WHERE t.doc_id < 100""".stripMargin,

    // the oracle PREDICTS every field the real header parse must decode:
    // the synthesized container is deterministic in (doc_id, n_chars), so
    // a parser that misreads any offset hash-mismatches here
    "q_multimodal" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN 4
        |    WHEN doc_id % 2 = 0 THEN 54 + OCTET_LENGTH(ENCODE(text))
        |    ELSE 44 + OCTET_LENGTH(ENCODE(text)) END AS INT) AS byte_len,
        |  CASE WHEN doc_id % 11 = 3 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS kind,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN n_chars % 64 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN (n_chars // 64) % 64 + 1 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 3 ELSE n_chars % 2 + 1 END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN ORD('B')
        |    WHEN doc_id % 2 = 0 THEN ORD('B') ELSE ORD('R') END AS INT) AS first_byte,
        |  CAST(CASE WHEN doc_id % 11 = 3 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 1
        |    ELSE OCTET_LENGTH(ENCODE(text)) // (2 * (n_chars % 2 + 1))
        |    END AS INT) AS n_frames
        |FROM documents""".stripMargin,

    // the resample oracle PREDICTS the weighted checksum over exactly
    // the pixels / sample bytes a correct 2x nearest-neighbor
    // downsample (stride-aware, bottom-up rows) / 2x frame decimation
    // must keep: the fixture pixel at (x,y,c) is
    // (id*31 + x*7 + y*13 + c*17) % 256, so the oracle enumerates the
    // kept positions and sums them with position weights that break
    // flip/transpose symmetry. A resampler that misreads the row
    // stride, walks rows top-down, picks the wrong source pixel, or
    // re-encodes the wrong dims hash-mismatches here.
    "q_mm_resize" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ((n_chars % 64 + 1) + 1) // 2 AS w2,
        |    (((n_chars // 64) % 64 + 1) + 1) // 2 AS h2
        |  FROM documents WHERE doc_id % 11 <> 3 AND doc_id % 2 = 0),
        |bsum AS (
        |  SELECT b.doc_id,
        |    SUM(((b.doc_id*31 + (2*x.x)*7 + (2*y.y)*13 + c.c*17) % 256)
        |        * (1 + (x.x*5 + y.y*3 + c.c) % 7)) AS checksum
        |  FROM b, range(0,32) x(x), range(0,32) y(y), range(0,3) c(c)
        |  WHERE x.x < b.w2 AND y.y < b.h2
        |  GROUP BY b.doc_id),
        |w AS (
        |  SELECT doc_id, (n_chars % 2 + 1) AS ch,
        |    ((n_chars % 50 + 5) + 1) // 2 AS nf2
        |  FROM documents WHERE doc_id % 11 <> 3 AND doc_id % 2 = 1),
        |wsum AS (
        |  SELECT w.doc_id,
        |    SUM(((w.doc_id*31 + (2*j.j)*7 + bb.b*13 + c.c*17) % 256)
        |        * (1 + (j.j*5 + c.c*3 + bb.b) % 7)) AS checksum
        |  FROM w, range(0,28) j(j), range(0,2) c(c), range(0,2) bb(b)
        |  WHERE j.j < w.nf2 AND c.c < w.ch
        |  GROUP BY w.doc_id)
        |SELECT b.doc_id, 'bmp' AS kind,
        |  CAST(b.w2 AS INT) AS out_w, CAST(b.h2 AS INT) AS out_h,
        |  CAST(NULL AS INT) AS out_frames,
        |  CAST(54 + ((b.w2*3 + 3) // 4) * 4 * b.h2 AS INT) AS resized_len,
        |  CAST(bsum.checksum AS BIGINT) AS checksum
        |FROM b JOIN bsum USING (doc_id)
        |UNION ALL
        |SELECT w.doc_id, 'wav', NULL, NULL, CAST(w.nf2 AS INT),
        |  CAST(44 + 2 * w.ch * w.nf2 AS INT), CAST(wsum.checksum AS BIGINT)
        |FROM w JOIN wsum USING (doc_id)
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL
        |FROM documents WHERE doc_id % 11 = 3""".stripMargin,

    // the oracle rebuilds the same deterministic dirty decoration with
    // chr() and replays the clean pipeline with DuckDB's own
    // nfc_normalize — if the Spark-side NFC expression or any strip
    // rule drifts, lengths and tails mismatch
    "q_text_clean" ->
      """WITH d0 AS (SELECT doc_id,
        |  text || ' cafe' || chr(769) || chr(8203) || chr(160) || 'x'
        |       || chr(9) || chr(9) || ' y' || chr(7) AS dirty
        |  FROM documents),
        |c AS (SELECT doc_id, dirty,
        |  TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
        |    NFC_NORMALIZE(dirty),
        |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}\x{200B}-\x{200D}\x{FEFF}]',
        |    '', 'g'),
        |    chr(160), ' ', 'g'),
        |    '[ \t\n\r]+', ' ', 'g')) AS clean FROM d0)
        |SELECT doc_id, LENGTH(dirty) AS dirty_len,
        |  LENGTH(clean) AS clean_len, RIGHT(clean, 12) AS tail
        |FROM c""".stripMargin,

    // replay the planted markup and all three strip rules; lengths and
    // head value-check the rules (tags, URLs, whitespace collapse)
    "q_text_strip_markup" ->
      """WITH r AS (SELECT doc_id,
        |  '<p class="doc">' || COALESCE(text, '') || '</p> see ' ||
        |  'https://ex.am/d/' || CAST(doc_id AS VARCHAR) || ' <br/>' AS raw
        |  FROM documents),
        |c AS (SELECT doc_id, raw,
        |  TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(raw,
        |    '<[^>]*>', ' ', 'g'),
        |    'https?://[^ ]+', ' ', 'g'),
        |    '[ \t\n\r]+', ' ', 'g')) AS clean FROM r)
        |SELECT doc_id, LENGTH(raw) AS raw_len,
        |  LENGTH(clean) AS clean_len, SUBSTRING(clean, 1, 40) AS head
        |FROM c""".stripMargin,

    // mirror every double op of the Spark side exactly (same literals,
    // same parenthesization); the only libm call (ln) is floor-rounded
    // to 6 dp immediately and everything downstream accumulates as
    // exact decimals — the tfidf precedent
    "q_bm25" ->
      """WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        |       WHERE LENGTH(tok) > 0 GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks
        |       WHERE LENGTH(tok) > 0 GROUP BY doc_id),
        |g AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |        AS avgdl, CAST(COUNT(*) AS DOUBLE) AS nd FROM dl),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |idf AS (SELECT tok,
        |    FLOOR(LN((nd - df + 0.5) / (df + 0.5) + 1.0) * 1000000 + 0.5)
        |      / 1000000 AS idf FROM df, g),
        |q AS (SELECT DISTINCT doc_id AS qid, tok FROM tf WHERE doc_id < 5),
        |s AS (SELECT q.qid, tf.doc_id,
        |    SUM(CAST(FLOOR((idf.idf * (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl)))
        |      * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6))) AS sc
        |  FROM q JOIN tf USING (tok) JOIN idf USING (tok)
        |    JOIN dl ON tf.doc_id = dl.doc_id, g
        |  WHERE tf.doc_id <> q.qid GROUP BY q.qid, tf.doc_id)
        |SELECT qid, doc_id,
        |  FLOOR(CAST(sc AS DOUBLE) * 1000 + 0.5) / 1000 AS score,
        |  CAST(rk AS INT) AS rk
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY sc DESC, doc_id) AS rk FROM s)
        |WHERE rk <= 10""".stripMargin,

    // the integer-log2 surprisal is libm-free: bitlen(count) via BIN()
    // string length in both engines, sums exact
    "q_lm_surprisal" ->
      """WITH d AS (SELECT doc_id,
        |    LIST_FILTER(STRING_SPLIT(text, ' '), x -> LENGTH(x) > 0) AS ts
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    UNNEST([ts[i] || ' ' || ts[i+1] FOR i IN RANGE(1, LEN(ts))]) AS bg
        |  FROM d),
        |bb AS (SELECT doc_id, bg, STRING_SPLIT(bg, ' ')[1] AS w1 FROM b),
        |uc AS (SELECT w1, COUNT(*) AS uc FROM bb GROUP BY w1),
        |bc AS (SELECT bg, COUNT(*) AS bc FROM bb GROUP BY bg),
        |s AS (SELECT bb.doc_id,
        |    LENGTH(BIN(uc.uc)) - LENGTH(BIN(bc.bc)) AS surp
        |  FROM bb JOIN uc USING (w1) JOIN bc USING (bg))
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(surp) AS BIGINT) AS sum_surprisal,
        |  FLOOR(CAST(SUM(surp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS avg_surprisal
        |FROM s GROUP BY doc_id""".stripMargin,

    "q_mixture_temp" ->
      """WITH n AS (SELECT source, COUNT(*) AS n FROM documents
        |           GROUP BY source),
        |w AS (SELECT source, n,
        |      CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
        |        AS w_scaled FROM n),
        |t AS (SELECT CAST(SUM(w_scaled) AS BIGINT) AS tot_w FROM w)
        |SELECT source, n, w_scaled,
        |  CAST((100000 * w_scaled) // tot_w AS BIGINT) AS target_docs
        |FROM w, t""".stripMargin,

    "q_shuffle_det" ->
      """WITH r AS (SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS skey
        |           FROM documents),
        |o AS (SELECT doc_id, skey,
        |      ROW_NUMBER() OVER (ORDER BY skey, doc_id) AS rn FROM r)
        |SELECT doc_id, skey, CAST((rn - 1) % 16 AS BIGINT) AS shard,
        |  CAST((rn - 1) // 16 AS BIGINT) AS pos_in_shard FROM o""".stripMargin
  )

  /** Exact all-pairs word-3-gram Jaccard — the oracle both LSH-verified
    * minhash dedup and direct n-gram Jaccard must reproduce. */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
       |sh AS (SELECT doc_id,
       |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
       |       FROM d WHERE LEN(ts) >= 3)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  ROUND(LEN(LIST_INTERSECT(a.s, b.s))
       |    / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))), 3) AS jaccard
       |FROM sh a, sh b
       |WHERE a.doc_id < b.doc_id
       |  AND LEN(LIST_INTERSECT(a.s, b.s))
       |    / (LEN(a.s) + LEN(b.s) - LEN(LIST_INTERSECT(a.s, b.s))) >= $threshold""".stripMargin
}
