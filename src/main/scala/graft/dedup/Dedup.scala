package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions
import graft.vector.VectorFunctions
import graft.similarity.Ann

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the point of each algorithm):
  *  - exact: one hash-shuffle on the fingerprint — the minimum possible.
  *  - MinHash+LSH: shingle→minhash→band→bucket-join. Cost is linear in
  *    corpus size + quadratic only within a NARROW bucket; the full n²
  *    pair space is never materialized. Candidates are then verified with
  *    exact Jaccard so band/hash parameters only affect recall, never
  *    precision. With b=16 bands × r=4 rows, a pair at Jaccard 0.9 is
  *    missed with probability (1-0.9⁴)¹⁶ ≈ 4e-8 — statistically exact.
  *  - SimHash: 64-bit signature; candidates must share one of 4 16-bit
  *    chunks (any pair within Hamming distance 3 shares a chunk by
  *    pigeonhole — exact recall, not probabilistic).
  *  - embedding near-dup: SRP-LSH banded candidates verified with exact
  *    cosine; the brute-force all-pairs path survives only as the
  *    differential-test baseline.
  */
object Dedup {

  /** Exact dedup: one row kept per normalized-text fingerprint (min id
    * wins — deterministic). Single hash aggregation, no sort. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures as ONE map-side native expression per doc
    * ([[graft.expressions.MinHashSignature]]): the shingle string is
    * hashed once and the k per-seed values derive from that 8-byte
    * state — bit-identical to the explode + `min(xxhash64(g, i))`
    * aggregate this replaces (MinHashSignatureSpec pins it), without
    * re-hashing the string k times or pushing one row per (doc,
    * shingle) through the aggregate machinery. No explode, no
    * aggregation, no exchange: signatures are a projection, so the
    * caller's partitioning flows through untouched. (Historical note:
    * k×`array_min(transform(...))` in one projection was measured 40×
    * slower than even the explode+agg form — interpreted lambdas per
    * element; the native expression sidesteps both.)
    *
    * Emits ONE ROW PER INPUT ROW: unlike the old `groupBy(id)` form,
    * duplicate `id`s are NOT collapsed into an element-wise min across
    * their combined shingle sets. All current callers (minhashPairs,
    * StandingIndex build/serve) feed unique ids; a caller with
    * duplicate ids must pre-aggregate. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val sig = sh.filter(size(col("sh")) > 0)
      .select(col("id"), graft.expressions.MinHashSignatureExpression
        .minhashSignature(col("sh"), numHashes).as("__ms"))
    sig.select(col("id") +:
      (0 until numHashes).map(i => col("__ms").getItem(i).as(s"m$i")): _*)
  }

  /** Candidate duplicate pairs via MinHash-LSH, verified with exact
    * Jaccard over the shingle sets. Returns (doc_a, doc_b, jaccard).
    *
    * Skew hardening — duplicate-heavy corpora are the NORM for this
    * operator (that is why it exists), and every copy of a hot document
    * used to land in the same (band, key) bucket 16 times over:
    *  1. Docs are first collapsed by their FULL minhash signature
    *     (`gk = xxhash64(m0..m63)`). B identical copies contribute ONE
    *     row to the banding join, so bucket size is bounded by the
    *     number of DISTINCT signatures in a bucket, not by corpus
    *     multiplicity. Banding a representative is lossless: members
    *     share the signature, so rep-level band collisions are exactly
    *     member-level ones.
    *  2. Pair generation is a self-equi-join (sort-merge: streams one
    *     side, spills the buffered group) instead of `collect_set` into
    *     a single unbounded in-memory array.
    *  3. Within-signature-group pairs and cross-group expansions rejoin
    *     through bare (id, gk/rep) tables — ids only in every exchange.
    * Every candidate pair — same-signature or banded — still goes
    * through the exact-Jaccard verification, so the output is identical
    * to the unhardened formulation (and to the all-pairs oracle).
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3, numHashes: Int = 64,
                   bands: Int = 16, threshold: Double = 0.9): DataFrame = {
    val rows = numHashes / bands
    // Work-vs-bytes partitioning (r12): documents are tiny in BYTES but
    // every row fans out into shingle + 64-minhash compute, so a
    // bytes-based scan split can hand the whole signature stage ONE
    // task (stage profile at sf1: two 7.8 s single-task stages — the
    // sig computation re-derived per consumer branch — while 31 cores
    // sat idle). When the scan yields fewer partitions than the shuffle
    // width, buy eval parallelism with an explicit-count exchange (AQE
    // would coalesce the ~MB exchange right back), then a SECOND
    // exchange carrying the computed shingle arrays so all three
    // consumers of `sh` (signatures, the a-side and b-side verification
    // attaches) reuse one materialization instead of re-shingling per
    // branch (measured 3x the verification-stage CPU when they did).
    // At real lake scale the scan is already wide and these
    // corpus-sized exchanges would be pure I/O waste — the condition
    // keeps the 100 TB plan exchange-free here.
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val slim = docs.select(col(idCol).as("id"), col(textCol).as("gtxt"))
    val narrowScan = graft.Tables.scanIsNarrow(slim)
    val sh = {
      val base = if (narrowScan) slim.repartition(nPart, col("id")) else slim
      val arrays = base
        .select(col("id"),
          TextFunctions.shingles(col("gtxt"), shingleSize).as("sh"))
        .filter(size(col("sh")) > 0)
      if (narrowScan) arrays.repartition(nPart, col("id")) else arrays
    }

    val mcols = (0 until numHashes).map(i => col(s"m$i"))
    val keyed = minhashSignatures(sh, numHashes)
      .withColumn("gk", xxhash64(mcols: _*))

    // one row per distinct signature; min() carries the shared m_i values
    val aggs = min(col("id")).as("rep") +:
      (0 until numHashes).map(i => min(col(s"m$i")).as(s"m$i"))
    val groups = keyed.groupBy(col("gk")).agg(aggs.head, aggs.tail: _*)
    val members = keyed.select(col("id"), col("gk"))

    // pairs of docs sharing the full signature (the duplicate-heavy case)
    val within = members.select(col("gk"), col("id").as("a"))
      .join(members.select(col("gk"), col("id").as("b")), "gk")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))

    // band key j = one codegen'd hash over that band's r signature mins
    val bandStructs = (0 until bands).map { j =>
      val cols = (j * rows until (j + 1) * rows).map(i => col(s"m$i"))
      struct(lit(j).as("band"), xxhash64(lit(j) +: cols: _*).as("key"))
    }
    val banded = groups
      .select(col("rep"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("rep"), col("bk"))
    val repPairs = banded.select(col("bk"), col("rep").as("ra"))
      .join(banded.select(col("bk"), col("rep").as("rb")), "bk")
      .filter(col("ra") < col("rb"))
      .select(col("ra"), col("rb"))
      .distinct()

    // expand rep-level band collisions to member pairs (groups are
    // disjoint, so cross-group pairs never duplicate within-group ones)
    val memRep = members
      .join(groups.select(col("gk"), col("rep")), "gk")
      .select(col("id"), col("rep"))
    val cross = repPairs
      .join(memRep.select(col("rep").as("ra"), col("id").as("ia")), "ra")
      .join(memRep.select(col("rep").as("rb"), col("id").as("ib")), "rb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"))

    val cand = within.union(cross)

    val withSets = cand
      .join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sh_a"), "a")
      .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "sh_b"), "b")

    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** 64-bit SimHash per doc — a single native map-side expression
    * (see [[graft.expressions.SimHash64]]): bit b is set iff the
    * majority of distinct xxhash64'd tokens have bit b set. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.expressions.SimHashExpression.simhash64(col(textCol)).as("simhash"))

  /** Near-dup pairs within Hamming distance `maxHamming` (≤ 3 uses 4
    * 16-bit chunk blocking — exact by pigeonhole). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // one long per doc, computed map-side; the repartition spreads the
    // chunk-join work across cores (the fixture scan is one split) and
    // is the natural exchange at cluster scale too.
    val sig = simhash(docs, idCol, textCol).repartition(col("id"))
    val chunked = sig.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"),
      col("id").as("a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"),
      col("id").as("b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("a") < col("b"))
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Direct n-gram Jaccard pairs (no LSH) — the small-corpus/oracle
    * path; quadratic via an inverted shingle index rather than a cross
    * join, so only docs sharing ≥1 shingle ever pair. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int, threshold: Double): DataFrame = {
    // Each inverted-index row carries its doc's set size, so |A| and |B|
    // flow through the pair aggregation as first() — no join-back to the
    // shingle table. The repartition is a deliberate exchange barrier:
    // it materializes (id, n, shingles) exactly once per doc and spreads
    // the pair-explosion across cores. Without it, whole-stage codegen
    // fuses scan→shingles→explode→join→agg into the scan's (single)
    // partition and defers the size() projection to the per-PAIR stream —
    // measured 10-20× slower. At cluster scale the barrier is the right
    // plan anyway: an inverted-index join wants to shuffle on its key.
    // The widen ahead of the shingle projection is the work-vs-bytes
    // move (r15): without it the shingling itself runs inside the
    // single-split fixture scan task; pass-through on a wide lake scan.
    // KNOWN double evaluation, inherent: the emptiness filter (and with
    // it one shingling pass) runs in the SCAN task below the widen
    // exchange, then the projection re-shingles post-exchange. Swapping
    // the explicit filter for a cheap bit-equivalent predicate
    // (size(split(g,' ',-1)) >= n) does NOT remove it — Catalyst's
    // InferFiltersFromGenerate re-infers size(wordshingles(g,n)) > 0
    // from the explode below and pushes it through the exchange anyway
    // (verified in the r16 plan), so the swap only adds a redundant
    // per-row split. Accepted and kept explicit.
    val inv = graft.Tables.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("gtxt")), col("id"))
      .select(col("id"),
        TextFunctions.shingles(col("gtxt"), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), size(col("sh")).as("n"), col("sh"))
      .repartition(col("id"))
      .select(col("id"), col("n"), explode(col("sh")).as("g"))
    val pairs = inv.select(col("g"), col("id").as("a"), col("n").as("na"))
      .join(inv.select(col("g"), col("id").as("b"), col("n").as("nb")), "g")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
    pairs
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** Embedding near-dup: pairs with rounded cosine ≥ threshold, found
    * via SRP-LSH banding + exact-cosine verification — the all-pairs
    * space is never materialized.
    *
    * Candidate generation bands `numSigs` independent 64-bit SRP
    * signatures into `numSigs × bands` buckets; only ids sharing a
    * (band, key) pair up, ids-only through every exchange, and each
    * candidate is verified with the exact (rounded) cosine, so banding
    * parameters affect recall only, never precision. Miss probability
    * per true pair at cosine τ is (1 − p^w)^(bands·numSigs) with
    * p = 1 − acos(τ)/π and w the band width: τ=0.4, w=4, 64 bands →
    * ≈ 1.6e-5 (and falling fast as τ grows: ≈ 1e-26 at τ=0.9).
    *
    * Note the honest trade at LOW thresholds: τ=0.4 sits in the tail of
    * the random-pair cosine distribution, so 4-bit bands admit most
    * pairs as candidates — intrinsic to the task, not the plan. A real
    * near-dup pipeline runs at τ ≥ 0.8 where the same code prunes the
    * candidate space to ~0; wider bands (w=8) trade recall for pruning.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, dim: Int,
                     bits: Int = 64, bands: Int = 16,
                     numSigs: Int = 4): DataFrame = {
    val e = emb.select(col(idCol).as("id"),
      VectorFunctions.asDouble(col(vecCol)).as("v"))

    // Signature-collapse skew hardening (the minhash `gk` design, ported):
    // a dup-heavy corpus puts m identical vectors into EVERY one of the
    // numSigs×bands buckets, and banding ids directly would generate
    // 256·m² candidate rows before the distinct. Instead ids collapse to
    // one representative per full-signature tuple; within-group pairs are
    // emitted directly (m² once, the true output size), and only the reps
    // band — band keys are a pure function of the signature, so members
    // share their group's bands exactly and no candidate is lost. Every
    // candidate is still verified with the exact rounded cosine.
    // gk is a 64-bit hash OF the signature tuple, not the tuple itself: a
    // 2^-64 collision between distinct tuples would merge their groups and
    // band a chimera min() signature belonging to neither — a silent
    // recall loss strictly smaller than the SRP banding miss probability
    // itself (~1.6e-5 per true pair), accepted as part of the ANN error
    // budget; every surviving candidate is still exact-cosine verified.
    val sigs = Ann.withSignatures(e, "v", dim, bits, numSigs)
      .withColumn("gk", xxhash64((0 until numSigs).map(s => col(s"__sig$s")): _*))
    val members = sigs.select(col("id"), col("gk"))
    val groupAggs = min(col("id")).as("rep") +:
      (0 until numSigs).map(s => min(col(s"__sig$s")).as(s"__sig$s"))
    val groups = sigs.groupBy(col("gk")).agg(groupAggs.head, groupAggs.tail: _*)

    val within = members.select(col("gk"), col("id").as("a"))
      .join(members.select(col("gk"), col("id").as("b")), "gk")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))

    val bandedReps = Ann.explodeBands(groups.drop("gk"), numSigs, bits, bands)
      .select(col("rep"), col("bk"))
    val repPairs = bandedReps.select(col("bk"), col("rep").as("ra"))
      .join(bandedReps.select(col("bk"), col("rep").as("rb")), "bk")
      .filter(col("ra") < col("rb"))
      .select(col("ra"), col("rb"))
      .distinct()
    val memRep = members
      .join(groups.select(col("gk"), col("rep")), "gk")
      .select(col("id"), col("rep"))
    val cross = repPairs
      .join(memRep.select(col("rep").as("ra"), col("id").as("ia")), "ra")
      .join(memRep.select(col("rep").as("rb"), col("id").as("ib")), "rb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"))

    within.union(cross)
      .join(e.select(col("id").as("a"), col("v").as("va")), "a")
      .join(e.select(col("id").as("b"), col("v").as("vb")), "b")
      .withColumn("cos", VectorFunctions.cosineRounded(col("va"), col("vb"), 3))
      .filter(col("cos") >= threshold)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("cos").as("cos_sim"))
  }

  /** Brute-force all-pairs cosine — differential-test baseline ONLY
    * (O(n²); the id cap keeps tests honest about that). */
  def embeddingPairsBrute(emb: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, idCap: Long = Long.MaxValue): DataFrame = {
    val e = emb.filter(col(idCol) < idCap)
      .select(col(idCol).as("id"), VectorFunctions.asDouble(col(vecCol)).as("v"))
    val a = e.select(col("id").as("a"), col("v").as("va"))
    val b = e.select(col("id").as("b"), col("v").as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("cos", VectorFunctions.cosineRounded(col("va"), col("vb"), 3))
      .filter(col("cos") >= threshold)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("cos").as("cos_sim"))
  }

  /** Shingle CONTAINMENT pairs: |A ∩ B| / |A| ≥ threshold, A ≠ B —
    * the asymmetric cousin of Jaccard that catches a document embedded
    * inside a larger one (quote inclusion, page-in-crawl), which
    * symmetric Jaccard misses because the size difference dilutes the
    * union. Same inverted-index shape as [[ngramJaccardPairs]] (only
    * docs sharing ≥ 1 shingle ever pair; one exchange on the shingle
    * key, pair aggregation carries ids + counts only), emitted in both
    * directions since containment is directional. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int, threshold: Double): DataFrame = {
    // same widen-before-shingling as ngramJaccardPairs (work-vs-bytes),
    // same accepted scan-side filter double-eval (see note there:
    // InferFiltersFromGenerate re-infers it from the explode regardless)
    val inv = graft.Tables.widen(
        docs.select(col(idCol).as("id"), col(textCol).as("gtxt")), col("id"))
      .select(col("id"),
        TextFunctions.shingles(col("gtxt"), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), size(col("sh")).as("n"), col("sh"))
      .repartition(col("id"))
      .select(col("id"), col("n"), explode(col("sh")).as("g"))
    inv.select(col("g"), col("id").as("inner_doc"), col("n").as("na"))
      .join(inv.select(col("g"), col("id").as("outer_doc")), "g")
      .filter(col("inner_doc") =!= col("outer_doc"))
      .groupBy(col("inner_doc"), col("outer_doc"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"))
      .withColumn("c", col("inter") / col("na"))
      .filter(col("c") >= threshold)
      .select(col("inner_doc"), col("outer_doc"),
        round(col("c"), 3).as("containment"))
  }
}
