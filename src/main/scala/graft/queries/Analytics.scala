package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.dedup.Dedup

/** Analytical / data-science operators over the fixture tables: statistical
  * aggregates (corr/covar/stddev, MAD, entropy, winsorized means),
  * histograms, arg-max, event-sequence analysis (transitions, funnel,
  * cohort retention, SCD2 history, time-spine gap fill), fuzzy
  * (edit-distance) and containment matching, normalized dedup, sequence
  * packing + train/val/test splits, data-quality constraint reports,
  * null-safe joins, and the spark.sql front door.
  *
  * These are the report/feature-engineering layer a training-data pipeline
  * runs on top of the relational substrate (reference: UDA provides only the
  * shuffle/merge substrate — src/Merger/MergeQueue.h:126-270 — every category
  * here is new engine surface per SURVEY.md §2.2's "none in reference" rows).
  *
  * Determinism notes (the oracle hash-compares values):
  *  - `events.ts` is nanos in parquet, micros in Spark (Tables.events); every
  *    ORDER BY in this file first truncates to milliseconds IN BOTH ENGINES
  *    and tie-breaks on `event_id`, so window order is engine-independent.
  *  - doubles that pass through accumulation are rounded (corr to 4 dp,
  *    spreads to 2 dp) — both engines compute Pearson/variance streaming;
  *    rounding absorbs the ~1e-12 summation-order difference.
  */
object Analytics {

  /** ms-truncated event time — identical in Spark (µs input) and DuckDB
    * (ns input): both floor to the millisecond. */
  private def tsm: Column = date_trunc("millisecond", col("ts"))

  /** Edit-distance (<=2) self-match on `p_name`, blocked on the composite
    * (p_size, length-band) key — see the `q_fuzzy_join` entry for the
    * recall proof. Exposed for the bounded-block-size spec.
    *
    * Bench note (r05): r04's bimodal runs [4.36, 8.16, 8.02] were host
    * contention, not a second plan mode — 5 back-to-back runs on a
    * quiet host (load 2.5/32 cpus) measured 10.4 (warm-up), 4.37, 4.27,
    * 3.97, 3.91 s at sf0.1; block sizes are bounded by construction. */
  private[graft] def fuzzyJoin(p: DataFrame): DataFrame = {
    val bw = 8 // band width; must be > 2*maxDist so the length interval
               // [len-2, len+2] spans at most two consecutive bands
    // the part table is tiny in BYTES but every row fans out into
    // ~400 candidate DP evaluations, so a bytes-based scan split gives
    // the whole eval stage ONE partition (r12 stage profile at sf1:
    // run 31.3 s = cpu 31.1 s on a single core while 31 sat idle —
    // and the leg's stubborn ~1.0 wall exponent was exactly a
    // single-threaded stage scaling with its candidate count).
    // Tables.widen buys eval parallelism only when the scan is narrow;
    // on a wide lake it passes through and both derived sides read the
    // scan directly (the exchange would be pure I/O waste there).
    val pr = graft.Tables.widen(p, col("p_partkey"))
    val a = pr.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"),
      col("p_size").as("size"),
      floor(length(col("p_name")) / bw).cast("long").as("band"))
    val b = pr.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"),
      col("p_size").as("size"),
      explode(array_distinct(array(
        floor((length(col("p_name")) - 2) / bw).cast("long"),
        floor((length(col("p_name")) + 2) / bw).cast("long")))).as("band"))
    a.join(b, Seq("size", "band"))
      .filter(col("key_a") < col("key_b"))
      // edit distance is bounded below by the length difference, so this
      // is a free exact prefilter ahead of the DP (r12: the direct-count
      // adjudication proved candidates linear; this cuts the constant)
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      // bounded-threshold levenshtein (Spark 3.5+): banded DP touches
      // O(len*k) cells instead of the full O(len^2) matrix and bails the
      // moment the band exceeds k, returning -1 — same kept rows and
      // distances as the unbounded form filtered to <= 2
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("dist") >= 0)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** The co-purchase part graph's undirected edge list (a < b): parts
    * are nodes, an edge joins two parts appearing in the same order.
    * Shared by the graph family (triangles, PageRank). localCheckpoint:
    * every consumer feeds it to several plan branches or an iteration,
    * and without materialization Catalyst re-derives the lineitem
    * self-join under each one (q_triangles' unmaterialized plan had 28
    * lineitem scans). */
  private[graft] def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // node ids as INTs: partkey cardinality fits, and the graph family
    // moves edge/adjacency payloads through every exchange — int keys
    // measured the sf1 triangle pipeline at 73 s vs 131 s on longs
    // (halved shuffle bytes + GC pressure). Consumers cast the final
    // output keys back to long for the oracle schema.
    // a plain cast would WRAP silently once partkeys outgrow Int
    // (TPC-H partkey = 200k×SF crosses Int.MaxValue near SF ~10k):
    // raise_error makes an oversized key space fail loudly instead of
    // corrupting node ids (merged/negative keys) at exactly the scale
    // these operators are pitched at
    // r16 edge-build restructure (guide §2.4 — remove shuffles outright).
    // The old shape was distinct -> self-join -> distinct: the per-side
    // (ok,pk) distinct paid its own (ok,pk) exchange AND a dedup hash
    // pass per join side, yet contributes nothing to the RESULT — the
    // final (a,b) distinct already collapses any duplicate pairs a
    // duplicate (ok,pk) row could produce (TPC-H's same-part-same-order
    // dup rate is ~0, so the pair stream barely grows). One explicit
    // hash exchange on ok now feeds BOTH self-join sides (runtime
    // ReuseExchange: written once) and doubles as the pair-generation
    // parallelizer; at lake scale the join's SMJ needs exactly this
    // partitioning, so the plan there also drops one full exchange.
    // A/B at sf0.1 (RunProbe, min-of-4, same window): 2.14 s -> 0.99 s
    // for the identical 1,196,000-edge set.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"),
        when(col("l_partkey") <= lit(Int.MaxValue.toLong),
          col("l_partkey").cast("int"))
          .otherwise(raise_error(lit(
            "graph node id: l_partkey exceeds Int range")).cast("int"))
          .as("pk"))
      .repartition(col("ok"))
    li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .localCheckpoint()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- fixed-width histogram: one scan, partial+final count per bucket --
    "q_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") / 1000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))),

    // ---- statistical aggregates: corr / covar / stddev per group ---------
    "q_corr_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("cov_qp"))),

    // ---- arg-max (max_by): top order per market segment ------------------
    // max_by over a struct gives lexicographic (price, orderkey) arg-max —
    // deterministic under price ties; one partial+final aggregate, the
    // orders fact shuffles once on the segment key after a broadcast join.
    "q_argmax" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
          max(col("o_totalprice")).as("top_price"))
    }),

    // ---- event-sequence transitions (Markov edge counts) -----------------
    "q_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(tsm, col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- conversion funnel: signup -> view -> purchase, strictly ordered --
    // one scan: per-user min step times via conditional aggregation, then a
    // single-row reduce; no joins, no window.
    "q_funnel" -> ((s, d) => {
      def stepMin(t: String) = min(when(col("event_type") === t, tsm))
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(stepMin("signup").as("t_signup"), stepMin("view").as("t_view"),
          stepMin("purchase").as("t_purchase"))
        .agg(
          sum(when(col("t_signup").isNotNull, 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("t_signup") < col("t_view"), 1L).otherwise(0L))
            .as("n_signup_view"),
          sum(when(col("t_signup") < col("t_view") &&
                   col("t_view") < col("t_purchase"), 1L).otherwise(0L))
            .as("n_full_funnel"))
    }),

    // ---- SCD2 history build (the CDC/merge pattern): each signup event is
    // a new dimension version; valid_to = next version's valid_from ---------
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(tsm, col("event_id"))
      Tables.events(s, d)
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("vf", tsm)
        .withColumn("vt", lead(col("vf"), 1).over(w))
        .select(col("user_id"), col("event_id").as("version_id"),
          date_format(col("vf"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          coalesce(date_format(col("vt"), "yyyy-MM-dd HH:mm:ss"),
            lit("9999-12-31 00:00:00")).as("valid_to"),
          col("vt").isNull.as("is_current"))
    }),

    // ---- cohort retention: signup-week cohorts x weeks-since activity ----
    "q_cohort" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(date_trunc("week", min(tsm)).as("cohort_week"))
      val active = ev
        .select(col("user_id"), date_trunc("week", tsm).as("wk")).distinct()
      active.join(cohort, Seq("user_id"))
        .filter(col("wk") >= col("cohort_week"))
        .groupBy(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("int")
            .as("weeks_since"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // ---- fuzzy (edit-distance) match: blocked self-join ------------------
    // COMPOSITE blocking key (p_size, name-length band): p_size alone gives
    // O(n/50) rows per block and quadratic levenshtein within each — at
    // 100x data that is 10^4x pair work. The length band is RECALL-
    // PRESERVING by pigeonhole: dist <= 2 forces |len(a)-len(b)| <= 2, and
    // with band = floor(len/8) the interval [len_b-2, len_b+2] spans at
    // most two consecutive bands — side B emits both, side A emits its one
    // exact band, so every qualifying pair meets in exactly one
    // (size, band) block (no post-join dedup needed). The join stays an
    // equi-join on the composite key; levenshtein runs only on in-block
    // pairs, and block size is bounded by names-per-(size x 8-char band).
    "q_fuzzy_join" -> ((s, d) => fuzzyJoin(Tables.part(s, d))),

    // ---- normalized (order-insensitive) dedup: the fingerprint is the
    // SORTED DISTINCT TOKEN SET, so casefold/reorder/repeat variants of the
    // same content collapse to one group — the cheap "fuzzy-exact" pass
    // every corpus pipeline runs before spending MinHash on real near-dups.
    // Map-side fingerprint, one hash exchange on the md5 — same scale shape
    // as exact dedup.
    "q_dedup_norm" -> ((s, d) => {
      val norm = array_join(
        array_sort(array_distinct(split(lower(col("text")), " "))), " ")
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm"))
        .groupBy(md5(col("norm")).as("fp"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canonical"),
          concat_ws(",", sort_array(collect_list(col("doc_id")))).as("members"))
        .filter(col("n") > 1)
    }),

    // ---- shingle containment: doc-inside-doc detection (asymmetric) ------
    "q_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 3, threshold = 0.9)),

    // ---- time-series gap fill + forward fill ------------------------------
    // Build the dense minute spine with sequence()+explode (the 1-row
    // min/max statistic broadcast back — same shape as q_quality_filter),
    // left-join the sparse resample, then forward-fill with the DISTRIBUTED
    // two-phase scan (Prefix.fillForward): within-bucket fill partitioned on
    // a 1024-minute bucket of the spine, per-bucket last-non-null carries
    // through the only SinglePartition stage (one row per bucket), carries
    // broadcast back. However long the history grows, no task ever sees
    // more than one bucket of spine. (q_gap_fill_keyed is the per-series
    // form — partitioned windows, no global scan needed at all.)
    "q_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val base = ev.filter(col("event_type") === "purchase")
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("v"))
      val bounds = base.agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
      val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 minute"))).as("minute"))
      graft.operators.Prefix.fillForward(
          spine.join(base, Seq("minute"), "left"),
          bucket = floor(col("minute").cast("long") / (60L * 1024L)).cast("long"),
          order = Seq(col("minute")),
          value = "v", out = "filled")
        .select(date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("m"),
          col("v").isNull.as("was_gap"), col("filled"))
    }),

    // ---- keyed gap fill: the scalable form of q_gap_fill — every window
    // and spine is PARTITIONED by the series key, so no single-partition
    // stage exists at all; series count × history length bounds the spine.
    "q_gap_fill_keyed" -> ((s, d) => {
      val base = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      val spine = base.groupBy(col("event_type"))
        .agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 minute")))
            .as("minute"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("minute"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(base, Seq("event_type", "minute"), "left")
        .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("event_type"),
          date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("m"),
          col("v").isNull.as("was_gap"), col("filled"))
    }),

    // ---- keyed linear interpolation: the other half of gap filling ------
    // Forward fill repeats the last anchor; interpolation draws the line
    // between the surrounding anchors — the resampling step for numeric
    // series (sensor/metric data) where a held value would bias sums.
    // Anchors: backward last-non-null over an ascending running frame,
    // and forward next-non-null over a DESCENDING running frame — never
    // a [current, unbounded following] frame, which WindowExec evaluates
    // by recomputing the aggregate per row (O(n^2) per partition: the
    // ascending-frame form measured 0.6 s where the following-frame form
    // ground for 350 s at sf0.1). Both windows share one hash exchange
    // on the series key; the arithmetic is row-local. Ends extrapolate
    // flat (no anchor on one side → the other anchor).
    "q_interp" -> ((s, d) => {
      val base = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      val spine = base.groupBy(col("event_type"))
        .agg(min(col("minute")).as("lo"), max(col("minute")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 minute")))
            .as("minute"))
      val wB = Window.partitionBy(col("event_type")).orderBy(col("minute"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // descending order + running frame ≡ "first non-null at or after
      // the current row" in ascending time, at O(n) instead of O(n^2)
      val wF = Window.partitionBy(col("event_type")).orderBy(col("minute").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = col("minute").cast("long")
      spine.join(base, Seq("event_type", "minute"), "left")
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
        .withColumn("pt", last(when(col("v").isNotNull, t), ignoreNulls = true).over(wB))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wF))
        .withColumn("nt", last(when(col("v").isNotNull, t), ignoreNulls = true).over(wF))
        .select(col("event_type"),
          date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("m"),
          col("v").isNull.as("was_gap"),
          // floor(x*1000 + 0.5)/1000 instead of round(): the interpolated
          // double is bit-identical in both engines (same IEEE op order
          // over exact-cents anchors and integer seconds), but round()'s
          // tie behavior at the .0005 boundary is not — floor is
          { val e = when(col("v").isNotNull, col("v"))
              .when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(col("pv") + (col("nv") - col("pv")) *
                (t - col("pt")) / (col("nt") - col("pt")))
            (floor(e * lit(1000) + lit(0.5)) / lit(1000)).as("interp") })
    }),

    // ---- hapax ratio: share of the vocabulary seen exactly once — the
    // classic corpus-health metric (high hapax share ⇒ noisy/OCR text,
    // low ⇒ templated/duplicated text). Two partial+final aggregates. ----
    "q_hapax" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("hapax"))
        .withColumn("hapax_ratio", round(col("hapax") / col("vocab"), 4))),

    // ---- cross-source shingle overlap matrix: which corpus slices share
    // content (mirror sites, syndication, benchmark leakage between
    // sources). Distinct (source, 5-gram) inverted index → self-join on
    // the gram → pair counts; grams are the join key so only sources
    // sharing a gram ever pair (the q_contamination machinery lifted to
    // source granularity). -----------------------------------------------
    "q_source_overlap" -> ((s, d) => {
      // work-vs-bytes: shingling otherwise runs in the single-split
      // fixture scan task; widen on doc_id first (pass-through on a
      // wide lake scan)
      val grams = Tables.widen(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text")), col("doc_id"))
        .select(col("source"),
          explode(graft.text.TextFunctions.shingles(col("text"), 5)).as("g"))
        .distinct()
      val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val withSz = grams.join(broadcast(sizes), "source")
      withSz.select(col("g"), col("source").as("src_a"), col("sz").as("sz_a"))
        .join(withSz.select(col("g"), col("source").as("src_b"),
          col("sz").as("sz_b")), "g")
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("shared_grams"),
          first(col("sz_a")).as("sz_a"), first(col("sz_b")).as("sz_b"))
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          round(col("shared_grams") / least(col("sz_a"), col("sz_b")), 4)
            .as("overlap"))
    }),

    // ---- token-distribution Shannon entropy per source --------------------
    // H = log2(N) - Σ n·log2(n) / N over token counts: two aggregation
    // levels, both partial+final; the token space never leaves the shuffle
    // as anything bigger than (source, token, count).
    "q_entropy" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      toks.groupBy(col("source"))
        .agg(sum(col("n")).as("total"),
          sum(col("n") * log2(col("n"))).as("nlogn"),
          count(lit(1)).as("vocab"))
        .select(col("source"),
          round(log2(col("total")) - col("nlogn") / col("total"), 3)
            .as("entropy_bits"),
          col("vocab"))
    }),

    // ---- robust statistics: median absolute deviation per group ----------
    // Exact two-pass MAD: grouped exact median, broadcast back, grouped
    // exact median of |x - med| — the outlier-resistant spread metric
    // quality filtering uses when stddev is poisoned by the outliers
    // themselves.
    "q_mad" -> ((s, d) => {
      // work-vs-bytes: both percentile passes otherwise buffer every
      // value inside the single-split scan task (r15: 2.1 s wall at
      // ~2 busy cores); widen once — the identical exchange subtree is
      // reused by both passes, and it is pass-through on a wide lake.
      val li = Tables.widen(Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey")), col("l_orderkey"))
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(round(first(col("med")), 3).as("median_price"),
          round(expr("percentile(abs(l_extendedprice - med), 0.5)"), 3)
            .as("mad_price"))
    }),

    // ---- sequence packing: concat corpus in doc order, chunk into
    // fixed-token training examples. example_id = which 4096-token chunk
    // a doc's FIRST token lands in — the concat-and-chunk step of LLM
    // pre-training data prep. The global token offset is the distributed
    // Prefix scan (no single-partition window over the data). ------------
    "q_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.Prefix.runningSum(docs,
          bucket = (col("doc_id") / lit(500)).cast("long"),
          order = Seq(col("doc_id")),
          value = col("n_tokens"),
          out = "cum")
        .select(col("doc_id"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 4096).cast("long")
            .as("example_id"))
    }),

    // ---- deterministic 3-way train/val/test assignment -----------------
    // Salted-hash prefix ranges (~80/10/10): map-side, reproducible, and
    // engine-portable — the same assignment falls out of any system that
    // computes md5, so train/val membership survives a platform change.
    "q_split_assign" -> ((s, d) => {
      val h = substring(
        md5(concat(col("doc_id").cast("string"), lit("split-s0"))), 1, 2)
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(h < "cd", "train").when(h < "e7", "val").otherwise("test")
            .as("split"))
    }),

    // ---- data-quality constraint report: the expectations gate a
    // pipeline runs before promoting a batch. Each constraint is one
    // declarative aggregate or anti-join; output = violation counts
    // (0 = constraint holds). One row per constraint → trivially
    // mergeable across table shards at any scale. ------------------------
    "q_constraints" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val docs = Tables.documents(s, d)
      val nullKeys = li.filter(col("l_orderkey").isNull)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem.l_orderkey NOT NULL").as("constraint"),
          col("violations"))
      val nonNeg = li.filter(col("l_extendedprice") < 0)
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem.l_extendedprice >= 0").as("constraint"),
          col("violations"))
      val fk = li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("lineitem.l_orderkey IN orders").as("constraint"),
          col("violations"))
      val charRange = docs.filter(length(col("text")) =!= col("n_chars"))
        .agg(count(lit(1)).as("violations"))
        .select(lit("documents.n_chars = len(text)").as("constraint"),
          col("violations"))
      nullKeys.union(nonNeg).union(fk).union(charRange)
    }),

    // ---- winsorization: clip a metric at its group p05/p95 before
    // averaging — the outlier-robust normalization step for quality
    // scores/feature columns. Exact grouped percentiles broadcast back;
    // the fact scans twice but never shuffles rows, only the clipped
    // aggregate. -----------------------------------------------------------
    "q_winsorize" -> ((s, d) => {
      // work-vs-bytes: same single-task percentile-buffer profile as
      // q_mad — widen once, both passes reuse the exchange.
      val li = Tables.widen(Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey")), col("l_orderkey"))
      val bounds = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
          expr("percentile(l_extendedprice, 0.95)").as("hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .withColumn("w", greatest(least(col("l_extendedprice"), col("hi")),
          col("lo")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("w").cast(DecimalType(18, 2))).cast("double"), 2)
            .as("avg_winsorized"),
          round(sum(when(col("l_extendedprice") =!= col("w"), 1L)
            .otherwise(0L)) / count(lit(1)), 4).as("clipped_share"))
    }),

    // ---- skyline / Pareto frontier: parts not dominated on (min price,
    // max size). The naive formulation is an O(n²) dominance anti-join;
    // this is the sort-scan form: one tiny aggregate to one row per
    // distinct price, a STRICT global running max of size over price
    // order (two-phase distributed prefix scan — the only
    // SinglePartition is over ~one row per price bucket), then a
    // broadcast join of the (tiny) frontier back to the fact table.
    // A part is on the frontier iff nothing strictly cheaper has >= its
    // size (running-max test) and nothing at the same price is larger
    // (the per-price max join condition). Exact-tie twins both survive —
    // neither dominates the other.
    "q_skyline" -> ((s, d) => {
      val part = Tables.part(s, d)
      val cand = part.groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("mx"))
      val strict = graft.operators.Prefix.runningMax(cand,
        expr("CAST(p_retailprice AS BIGINT) DIV 100"),
        Seq(col("p_retailprice")), col("mx"), "m_strict",
        inclusive = false)
      val frontier = strict
        .filter(col("m_strict").isNull || col("mx") > col("m_strict"))
        .select(col("p_retailprice").as("fp"), col("mx"))
      part.join(broadcast(frontier),
          col("p_retailprice") === col("fp") && col("p_size") === col("mx"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    }),

    // ---- triangle counting on the co-purchase graph: parts are nodes,
    // an edge joins two parts appearing in the same order. The canonical
    // join-heavy graph workload, in the DEGREE-ORIENTED form: each
    // undirected edge points from its lower-(degree, id) endpoint, every
    // triangle is enumerated exactly once at its minimum vertex, and the
    // wedge join's per-node fan-out is bounded by the oriented
    // out-degree — O(√m) — instead of a hub part's full degree (the
    // naive id-oriented wedge join measured ~5× slower at sf0.1, and
    // the gap widens with any degree skew). Closing uses the
    // EDGE-ITERATOR form, not a wedge join: each oriented edge (u,v)
    // pulls the out-adjacency arrays of both endpoints and intersects
    // them, so the O(Σ outdeg²) wedge set — 41 M rows at sf0.1, 34×
    // the edge list — is never materialized or shuffled; only |E|
    // edges, |E| adjacency entries, and the actual triangles move.
    // The intersect is the native SortedIntIntersect merge walk over
    // pre-sorted adjacency (one sort_array per NODE, amortized over
    // ~outdeg probes per edge) — Spark's array_intersect builds a
    // boxed OpenHashSet per CALL, and at sf1's 12 M edges that was a
    // measured GC storm (6 000+ process-CPU s; the merge walk closes
    // the same graph in ~2 min of CPU). Adjacency arrays stay O(√m) entries by the
    // orientation, so no collect_list blow-up under hub skew. The edge
    // list feeds four plan branches (degree count, orientation,
    // adjacency); localCheckpoint computes it once instead of
    // re-deriving the lineitem self-join under every branch (the
    // unmaterialized plan had 28 lineitem scans). shuffle_hash on the
    // adjacency probes: the build side is the node-sized adjacency
    // table and the edge stream is never sorted. Output: top-20 parts
    // by triangle participation (count desc, partkey asc — total order).
    "q_triangles" -> ((s, d) => {
      val e = copurchaseEdges(s, d)
      val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).cast("int").as("deg"))
      val fwd = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      // degree attach via guarded broadcast (guide §3.1): deg is
      // node-sized (one int pair per part). Broadcasting it keeps the
      // orientation joins exchange-free, so `ed` inherits the edge
      // checkpoint's partitioning instead of AQE coalescing the ~10 MB
      // post-join exchange to ONE partition — which serialized the
      // CPU-heavy close below into a single task (RunStages: 2.2 s
      // one-task straggler). The guard also pins deg once (it used to
      // recompute per join side). Past the ceiling (lake-scale |V|)
      // it degrades to the old shuffle_hash-shaped plan.
      val degG = graft.BroadcastGuard.dim(deg, lit(12), "triangle degrees")
      val ed = e
        .join(degG.select(col("n").as("a"), col("deg").as("da")), "a")
        .join(degG.select(col("n").as("b"), col("deg").as("db")), "b")
        .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
          when(fwd, col("b")).otherwise(col("a")).as("v"))
        .localCheckpoint()
      // adjacency is consumed by BOTH closing probes — the guard's
      // pinned checkpoint materializes the 12M-row groupBy once (it
      // used to run twice at sf1). r16 (guide §2.3 — shuffle keys, not
      // payloads): the old unconditional shuffle_hash probes re-keyed
      // the (u, v, nu) stream on v, shipping every edge's FULL
      // neighbor array through an exchange — 231 MB at sf0.1 for a
      // 10 MB adjacency table (RunStages: that one fetch stage was
      // 15.5 run-s, the query's biggest). Guarded broadcast instead:
      // adjacency payload is measured (4 B/int + row overhead) and
      // broadcast only under half the configured ceiling, so both
      // probes become map-side hash lookups over the checkpointed edge
      // stream and NO neighbor array ever crosses an exchange; past
      // the ceiling (lake-scale graphs, where |V|+|E| outgrows the
      // driver) it degrades to exactly the old shuffle_hash plan —
      // the BroadcastGuard contract (the bm25/surprisal/tfidf shape).
      // No memoKey: the plan hangs off a per-invocation checkpoint, so
      // every invocation re-sizes its own adjacency — nothing persists
      // across bench passes.
      val adj = graft.BroadcastGuard.dim(
        ed.groupBy(col("u"))
          .agg(sort_array(collect_list(col("v"))).as("nbrs")),
        lit(12) + size(col("nbrs")) * 4, "triangles adjacency")
      // triangle (u, v, c) closes at oriented edge (u,v) for every c in
      // outNbrs(u) ∩ outNbrs(v); empty intersections vanish at explode
      val tri = ed
        .join(adj.select(col("u"), col("nbrs").as("nu")), "u")
        .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), "v")
        .select(col("u").as("wa"), col("v").as("wb"),
          explode(graft.expressions.SortedIntIntersect(
            col("nu"), col("nv"))).as("wc"))
      tri.select(explode(array(col("wa"), col("wb"), col("wc")))
          .as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n_triangles"))
        .select(col("pk").cast("long").as("p_partkey"), col("n_triangles"))
        .orderBy(col("n_triangles").desc, col("p_partkey")).limit(20)
    }),

    // ---- PageRank on the co-purchase graph, 3 Lloyd-style power
    // iterations with damping 0.85, in SCALED-INTEGER arithmetic: ranks
    // live as r·10^9 BIGINTs, per-edge contributions are integer
    // divisions (r div deg), and the damped update is
    // 0.15·10^9 + (85·Σcontrib) div 100 — every operation is exact and
    // order-independent, so a distributed sum over any partitioning
    // hash-matches the oracle bit-for-bit (a double-valued PageRank
    // could never be hash-compared across engines). Per iteration: one
    // hash join of the checkpointed edge list against the rank vector +
    // one partial+final aggregate — the plan a 100 TB power iteration
    // wants; localCheckpoint per iteration keeps the lineage flat, the
    // same pattern as Clusters.scala. Output: top-20 parts by rank
    // (rank desc, partkey asc — a total order; integer ranks make the
    // desc order deterministic).
    "q_pagerank" -> ((s, d) => {
      val e = copurchaseEdges(s, d)
      val ed = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint()
      val deg = ed.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .localCheckpoint()
      var r = deg.select(col("u"), lit(1000000000L).as("r"))
      for (it <- 1 to 3) {
        // iteration 1's rank vector is the constant 10^9, so its join
        // is an identity attach — fold the constant into the contrib
        // expression and skip one node-sized hash join of the 2|E|
        // edge stream (the same algebraic-first-iteration move as
        // q_label_prop's min specialization; output identical)
        val contrib = if (it == 1)
          ed.join(deg, "u")
            .select(col("v"), expr("1000000000 div dg").as("contrib"))
        else
          ed.join(r, "u").join(deg, "u")
            .select(col("v"), expr("r div dg").as("contrib"))
        r = contrib
          .groupBy(col("v")).agg(sum(col("contrib")).as("sc"))
          .select(col("v").as("u"),
            (lit(150000000L) + expr("(85 * sc) div 100")).as("r"))
          .localCheckpoint()
      }
      r.orderBy(col("r").desc, col("u")).limit(20)
        .select(col("u").cast("long").as("p_partkey"),
          col("r").as("rank_scaled"))
    }),

    // ---- deterministic label propagation (community detection), 3
    // SYNCHRONOUS iterations on the co-purchase graph: every node
    // adopts its neighbors' MODE label (most frequent; ties to the
    // smallest label — the deterministic form of the classic
    // nondeterministic LPA). Distinct from q_dup_clusters' connected
    // components: min-label CC converges to one label per component,
    // mode-LPA finds DENSE regions inside a component and is the
    // standard cheap community detector for co-occurrence graphs. All
    // state is (node int, label int); per iteration: one hash join of
    // the doubled edge list against the label vector + two partial+
    // final aggregates (count per (node,label), then max_by argmax) —
    // exactly PageRank's per-iteration plan, linear in |E|, nothing
    // driver-sized. Integer counts + lexicographic (n desc, label asc)
    // argmax make every iteration order-independent, so the result is
    // hash-exact across engines and partitionings. Output: top-20
    // communities by size (count desc, label asc — total order).
    "q_label_prop" -> ((s, d) => {
      val e = copurchaseEdges(s, d)
      val und = e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint()
      // ITERATION 1 IS ALGEBRAICALLY SPECIAL under self-initialization
      // (labels = node ids): every neighbor contributes its own id, and
      // und is a distinct edge set, so per src ALL neighbor labels are
      // distinct — every count is 1 and the (n desc, label asc) argmax
      // reduces exactly to min(neighbor id). That replaces the loop
      // body's join + zero-reduction (src,label) aggregate (iteration
      // 1's groups == messages == 2|E|, measured in RunGraphCount — the
      // single most expensive stage of the query) + argmax with ONE
      // fully-reducing min aggregate, no join. Provably identical
      // output; the oracle still replays 3 full mode iterations.
      var labels = und.groupBy(col("src"))
        .agg(min(col("dst")).as("label"))
        .select(col("src").as("node"), col("label"))
        .localCheckpoint()
      for (_ <- 2 to 3) {
        // label-vector attach via guarded broadcast (r16, guide §3.1):
        // labels is node-sized, but it hangs off a per-iteration
        // checkpoint whose stats Catalyst cannot see, so the join used
        // to re-exchange the 2|E| message stream on dst EVERY
        // iteration (RunStages: 20 MB exchange + barrier per round).
        // Broadcast under the measured ceiling keeps the messages in
        // the und cache and map-side; past it (lake-scale |V|) the
        // guard degrades to shuffle_hash — the old shape.
        val labG = graft.BroadcastGuard.dim(
          labels.select(col("node").as("dst"), col("label")),
          lit(12), "labelprop labels")
        labels = und
          .join(labG, "dst")
          // ONE exchange feeds BOTH aggregates: hash-partitioning on
          // src alone satisfies the (src,label) clustering too, so the
          // count agg AND the argmax agg run exchange-free on top of
          // it. Without this the (src,label) agg shuffles 2|E| rows
          // and the argmax agg shuffles its output AGAIN on src — and
          // iteration 1's (src,label) agg gets ZERO partial reduction
          // (labels are still node ids, so every (src,neighbor-label)
          // row is distinct: groups == messages == 2|E|, measured in
          // RunGraphCount), making that second exchange a full extra
          // 2|E|-row pass per iteration.
          .repartition(col("src"))
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
          // argmax as ONE scalar max over a packed BIGINT (r16, guide
          // §4): (n desc, label asc) is the lexicographic order of
          // n·2^32 + (Int.MaxValue − label) — labels are ints ≥ 0 and
          // n ≤ 2^31, so the pack cannot overflow a long and the max
          // is bit-equivalent to the old struct max_by, without
          // allocating/comparing a struct per row.
          .groupBy(col("src"))
          .agg(max(col("n") * lit(4294967296L) +
            (lit(Int.MaxValue.toLong) - col("label"))).as("packed"))
          .select(col("src").as("node"),
            (lit(Int.MaxValue.toLong) - col("packed") % lit(4294967296L))
              .cast("int").as("label"))
          .localCheckpoint()
      }
      labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("label")).limit(20)
        .select(col("label").cast("long").as("label"), col("n_members"))
    }),

    // ---- deterministic k-means (2 Lloyd iterations, k=8, spherical
    // assignment): the hash-comparable sibling of Ann.refineCentroids.
    // Seeds are the k lowest vec_ids; assignment is a MAP-SIDE argmax
    // over a literal centroid array (cosine rounded to 3 dp, ties to
    // the smaller cell — no join, no explosion, no shuffle to assign);
    // centroid updates accumulate per-dim decimal(18,9) sums (exact,
    // order-independent) and divide once as doubles. Only the k×dim
    // centroid table ever reaches the driver, once per iteration — the
    // same deliberate round-trip the IVF path makes. Output: per-cluster
    // size + mean assigned cosine + first centroid component.
    "q_kmeans" -> ((s, d) => {
      val k = 8
      // work-vs-bytes: widen the 1-partition embeddings scan so the
      // map-side argmax iterations run 32-way (r12 profile: 3-task
      // stages) — pass-through on a wide lake
      val e = graft.Tables.widen(Tables.embeddings(s, d)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("v")),
        col("vec_id"))
        .localCheckpoint()
      def best(cs: Seq[Seq[Double]]): Column =
        array_max(array(cs.zipWithIndex.map { case (c, j) =>
          struct(
            graft.vector.VectorFunctions
              .cosineRounded(col("v"), typedLit(c), 3).as("s"),
            lit(-j).as("nc"))
        }: _*))
      var cents: Seq[Seq[Double]] = e.orderBy(col("vec_id")).limit(k)
        .select(col("v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
      if (cents.isEmpty)
        // empty corpus: no seeds, no clusters — emit the empty relation
        // with the query's schema instead of an empty literal argmax
        e.select(lit(0).as("cell"), lit(0L).as("n"),
          lit(0.0).as("mean_cos"), lit(0.0).as("c_first")).limit(0)
      else {
      for (_ <- 1 to 2) {
        val means = e
          .withColumn("cell", -best(cents).getField("nc"))
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("cell"), col("dim"))
          .agg(sum(col("x").cast("decimal(18,9)")).as("sx"),
            count(lit(1)).as("n"))
          .groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("dim"),
            (col("sx").cast("double") / col("n").cast("double")).as("m"))))
            .as("dm"))
          .select(col("cell"), expr("transform(dm, p -> p.m)").as("c"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
        cents = cents.indices.map(j => means.getOrElse(j, cents(j)))
      }
      val c0 = cents.map(c => math.floor(c.head * 1e6 + 0.5) / 1e6)
      val firstComp = map_from_arrays(
        typedLit(cents.indices.toList), typedLit(c0.toList))
      e.withColumn("b", best(cents))
        .select((-col("b.nc")).as("cell"), col("b.s").as("cos"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (floor((sum(col("cos").cast("decimal(18,3)")).cast("double") /
            count(lit(1)).cast("double")) * 1e6 + 0.5) / 1e6).as("mean_cos"))
        .withColumn("c_first", firstComp(col("cell")))
      }
    }),

    // ---- 2-D histogram (the heatmap/profiling binning): fixed-width
    // integer bins on (quantity, discount) — one partial+final
    // aggregate over the facts, bin count bounded by the value domains,
    // never by data size.
    "q_histogram2d" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_quantity") / 10).cast("long").as("bin_qty"),
          floor(col("l_discount") * 50).cast("long").as("bin_disc"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))),

    // ---- per-group min-max normalization (feature scaling): group
    // bounds are a dim-sized aggregate broadcast back to the facts; the
    // normalized value is one map-side expression. Constant groups
    // (max == min) emit null, not a division blow-up.
    "q_minmax_norm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bounds = o.groupBy(col("o_orderpriority"))
        .agg(min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
      o.filter(col("o_orderkey") < 1000)
        .join(broadcast(bounds), "o_orderpriority")
        .select(col("o_orderkey"), col("o_orderpriority"),
          when(col("hi") =!= col("lo"),
            round((col("o_totalprice") - col("lo")) / (col("hi") - col("lo")),
              6)).as("price_norm"))
    }),

    // ---- rare-category collapse: fold categories with < 15 members
    // into 'OTHER' (the standard cardinality-control step before
    // one-hot/embedding features). One partial+final aggregate over the
    // facts; the collapse itself re-aggregates the DIM-sized count
    // table — no second pass over data.
    "q_rare_collapse" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy(col("p_type")).agg(count(lit(1)).as("n"))
        .groupBy(when(col("n") < 15, lit("OTHER")).otherwise(col("p_type"))
          .as("category"))
        .agg(sum(col("n")).as("n_parts"),
          count(lit(1)).as("n_merged_types"))),

    // ---- portable order-independent table fingerprint (the TeraValidate
    // role: prove two engines hold the SAME multiset of rows without
    // sorting anything). Per row: md5 of a canonical key projection, the
    // first 8 hex digits converted positionally (instr in a hex
    // alphabet — no engine-specific conv()), then two order-free
    // combiners: SUM and BIT_XOR. Map-side partial aggregation; the
    // shuffle carries 3 numbers.
    "q_checksum" -> ((s, d) => {
      val hexes = "0123456789abcdef"
      val h = md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus")))
      val rowVal = (0 until 8).map { j =>
        (instr(lit(hexes), substring(h, j + 1, 1)) - 1).cast("long") *
          (1L << (4 * j))
      }.reduce(_ + _)
      // work-vs-bytes: the md5-per-row fold otherwise runs inside the
      // single-split fixture scan task (r15: 1.4 s wall, 1.8 CPU-s —
      // one busy core); widen on the key, hash in parallel, and the
      // exchange after the partial aggregate still carries 3 numbers.
      Tables.widen(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_linestatus")), col("l_orderkey"))
        .select(rowVal.as("rv"))
        .agg(count(lit(1)).as("n_rows"), sum(col("rv")).as("sum_check"),
          expr("bit_xor(rv)").as("xor_check"))
    }),

    // ---- SQL front door: the same engine surface through spark.sql over
    // registered views, with an explicit BROADCAST hint — proving a SQL-
    // only user gets the identical (broadcast-dim, fact-shuffles-once)
    // plan the DataFrame API queries assert. --------------------------------
    "q_sql_front" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql("""
        SELECT /*+ BROADCAST(c), BROADCAST(n) */
          n.n_name, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""")
    }),

    // ---- null-safe join (<=>): NULL keys are real join partners ----------
    // (the normalized-field compare every CDC/upsert pipeline needs)
    "q_join_nullsafe" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("k",
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int"))
      val bucket = when(col("k") % 10 === 0, lit(null)).otherwise(col("k") % 10)
      val all = ev.select(bucket.as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_all"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(bucket.as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_purchase"))
      all.join(pur.withColumnRenamed("bucket", "bucket_p"),
          col("bucket") <=> col("bucket_p"), "left")
        .select(col("bucket"), col("n_all"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_histogram" ->
      """SELECT l_returnflag, CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_corr_stats" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
        |  ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qp
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_argmax" ->
      """SELECT c_mktsegment, o_orderkey AS top_order, o_totalprice AS top_price
        |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn = 1""".stripMargin,

    "q_transitions" ->
      """SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |FROM (SELECT event_type,
        |        LAG(event_type) OVER (PARTITION BY user_id
        |          ORDER BY DATE_TRUNC('milliseconds', ts), event_id) AS from_type
        |      FROM events)
        |WHERE from_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "q_funnel" ->
      """SELECT CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN t_signup < t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
        |  CAST(SUM(CASE WHEN t_signup < t_view AND t_view < t_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM (SELECT user_id,
        |        MIN(CASE WHEN event_type = 'signup' THEN DATE_TRUNC('milliseconds', ts) END) AS t_signup,
        |        MIN(CASE WHEN event_type = 'view' THEN DATE_TRUNC('milliseconds', ts) END) AS t_view,
        |        MIN(CASE WHEN event_type = 'purchase' THEN DATE_TRUNC('milliseconds', ts) END) AS t_purchase
        |      FROM events GROUP BY user_id)""".stripMargin,

    "q_scd2" ->
      """SELECT user_id, event_id AS version_id,
        |  STRFTIME(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  COALESCE(STRFTIME(vt, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
        |  vt IS NULL AS is_current
        |FROM (SELECT user_id, event_id, DATE_TRUNC('milliseconds', ts) AS vf,
        |        LEAD(DATE_TRUNC('milliseconds', ts)) OVER (PARTITION BY user_id
        |          ORDER BY DATE_TRUNC('milliseconds', ts), event_id) AS vt
        |      FROM events WHERE event_type = 'signup')""".stripMargin,

    "q_cohort" ->
      """WITH cohort AS (
        |  SELECT user_id, DATE_TRUNC('week', MIN(DATE_TRUNC('milliseconds', ts))) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, DATE_TRUNC('week', DATE_TRUNC('milliseconds', ts)) AS wk
        |  FROM events)
        |SELECT STRFTIME(cohort_week, '%Y-%m-%d') AS cohort,
        |  CAST(DATEDIFF('day', cohort_week, wk) / 7 AS INT) AS weeks_since,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c USING (user_id)
        |WHERE wk >= cohort_week GROUP BY 1, 2""".stripMargin,

    "q_fuzzy_join" ->
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  LEVENSHTEIN(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        |WHERE LEVENSHTEIN(a.p_name, b.p_name) <= 2""".stripMargin,

    "q_dedup_norm" ->
      """SELECT MD5(norm) AS fp, COUNT(*) AS n, MIN(doc_id) AS canonical,
        |  STRING_AGG(doc_id, ',' ORDER BY doc_id) AS members
        |FROM (SELECT doc_id,
        |        ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(LOWER(text), ' '))), ' ') AS norm
        |      FROM documents)
        |GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    "q_containment" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |sh AS (SELECT doc_id,
        |         LIST_DISTINCT([ARRAY_TO_STRING(ts[i:i+2], ' ') FOR i IN RANGE(1, LEN(ts)-1)]) AS s
        |       FROM d WHERE LEN(ts) >= 3)
        |SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
        |  ROUND(LEN(LIST_INTERSECT(a.s, b.s)) * 1.0 / LEN(a.s), 3) AS containment
        |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
        |WHERE LEN(LIST_INTERSECT(a.s, b.s)) * 1.0 / LEN(a.s) >= 0.9""".stripMargin,

    "q_gap_fill" ->
      """WITH base AS (
        |  SELECT DATE_TRUNC('minute', ts) AS minute,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |spine AS (
        |  SELECT UNNEST(GENERATE_SERIES(
        |    (SELECT MIN(minute) FROM base), (SELECT MAX(minute) FROM base),
        |    INTERVAL 1 MINUTE)) AS minute)
        |SELECT STRFTIME(s.minute, '%Y-%m-%d %H:%M:%S') AS m,
        |  b.v IS NULL AS was_gap,
        |  LAST_VALUE(b.v IGNORE NULLS) OVER (ORDER BY s.minute
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM spine s LEFT JOIN base b ON s.minute = b.minute""".stripMargin,

    "q_gap_fill_keyed" ->
      """WITH base AS (
        |  SELECT event_type, DATE_TRUNC('minute', ts) AS minute,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type,
        |    UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 MINUTE)) AS minute
        |  FROM (SELECT event_type, MIN(minute) AS lo, MAX(minute) AS hi
        |        FROM base GROUP BY 1))
        |SELECT s.event_type, STRFTIME(s.minute, '%Y-%m-%d %H:%M:%S') AS m,
        |  b.v IS NULL AS was_gap,
        |  LAST_VALUE(b.v IGNORE NULLS) OVER (PARTITION BY s.event_type
        |    ORDER BY s.minute
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM spine s LEFT JOIN base b
        |  ON s.event_type = b.event_type AND s.minute = b.minute""".stripMargin,

    "q_interp" ->
      """WITH base AS (
        |  SELECT event_type, DATE_TRUNC('minute', ts) AS minute,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type,
        |    UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 MINUTE)) AS minute
        |  FROM (SELECT event_type, MIN(minute) AS lo, MAX(minute) AS hi
        |        FROM base GROUP BY 1)),
        |j AS (
        |  SELECT s.event_type, s.minute, b.v,
        |    CAST(EPOCH(s.minute) AS BIGINT) AS t,
        |    LAST_VALUE(b.v IGNORE NULLS) OVER wb AS pv,
        |    LAST_VALUE(CASE WHEN b.v IS NOT NULL
        |      THEN CAST(EPOCH(s.minute) AS BIGINT) END IGNORE NULLS) OVER wb AS pt,
        |    FIRST_VALUE(b.v IGNORE NULLS) OVER wf AS nv,
        |    FIRST_VALUE(CASE WHEN b.v IS NOT NULL
        |      THEN CAST(EPOCH(s.minute) AS BIGINT) END IGNORE NULLS) OVER wf AS nt
        |  FROM spine s LEFT JOIN base b
        |    ON s.event_type = b.event_type AND s.minute = b.minute
        |  WINDOW
        |    wb AS (PARTITION BY s.event_type ORDER BY s.minute
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY s.event_type ORDER BY s.minute
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, STRFTIME(minute, '%Y-%m-%d %H:%M:%S') AS m,
        |  v IS NULL AS was_gap,
        |  FLOOR((CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END) * 1000 + 0.5) / 1000
        |    AS interp
        |FROM j""".stripMargin,

    "q_hapax" ->
      """WITH toks AS (
        |  SELECT source, tok, COUNT(*) AS n FROM (
        |    SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2)
        |SELECT source, COUNT(*) AS vocab,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS hapax_ratio
        |FROM toks GROUP BY source""".stripMargin,

    "q_source_overlap" ->
      """WITH d AS (SELECT source, STRING_SPLIT(text, ' ') AS ts FROM documents),
        |g AS (SELECT DISTINCT source, g FROM (
        |  SELECT source,
        |    UNNEST([ARRAY_TO_STRING(ts[i:i+4], ' ') FOR i IN RANGE(1, LEN(ts)-3)]) AS g
        |  FROM d WHERE LEN(ts) >= 5)),
        |sz AS (SELECT source, COUNT(*) AS sz FROM g GROUP BY 1)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  COUNT(*) AS shared_grams,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / LEAST(MIN(sa.sz), MIN(sb.sz)), 4) AS overlap
        |FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |JOIN sz sa ON sa.source = a.source
        |JOIN sz sb ON sb.source = b.source
        |GROUP BY 1, 2""".stripMargin,

    "q_entropy" ->
      """WITH toks AS (
        |  SELECT source, tok, COUNT(*) AS n FROM (
        |    SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS tok
        |    FROM documents) GROUP BY 1, 2)
        |SELECT source,
        |  ROUND(LOG2(SUM(n)) - SUM(n * LOG2(n)) / SUM(n), 3) AS entropy_bits,
        |  COUNT(*) AS vocab
        |FROM toks GROUP BY source""".stripMargin,

    "q_mad" ->
      """WITH med AS (
        |  SELECT l_returnflag, QUANTILE_CONT(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, ROUND(ANY_VALUE(m.med), 3) AS median_price,
        |  ROUND(QUANTILE_CONT(ABS(l.l_extendedprice - m.med), 0.5), 3) AS mad_price
        |FROM lineitem l JOIN med m USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,

    "q_pack" ->
      """SELECT doc_id, n_tokens,
        |  CAST(FLOOR((cum - n_tokens) / 4096.0) AS BIGINT) AS example_id
        |FROM (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM (SELECT doc_id,
        |              CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |            FROM documents))""".stripMargin,

    "q_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN SUBSTRING(MD5(CONCAT(CAST(doc_id AS VARCHAR), 'split-s0')), 1, 2) < 'cd' THEN 'train'
        |       WHEN SUBSTRING(MD5(CONCAT(CAST(doc_id AS VARCHAR), 'split-s0')), 1, 2) < 'e7' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "q_constraints" ->
      """SELECT 'lineitem.l_orderkey NOT NULL' AS constraint, COUNT(*) AS violations
        |FROM lineitem WHERE l_orderkey IS NULL
        |UNION ALL
        |SELECT 'lineitem.l_extendedprice >= 0', COUNT(*)
        |FROM lineitem WHERE l_extendedprice < 0
        |UNION ALL
        |SELECT 'lineitem.l_orderkey IN orders', COUNT(*)
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'documents.n_chars = len(text)', COUNT(*)
        |FROM documents WHERE LEN(text) <> n_chars""".stripMargin,

    "q_winsorize" ->
      """WITH bounds AS (
        |  SELECT l_returnflag,
        |    QUANTILE_CONT(l_extendedprice, 0.05) AS lo,
        |    QUANTILE_CONT(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n,
        |  ROUND(CAST(AVG(CAST(GREATEST(LEAST(l.l_extendedprice, b.hi), b.lo)
        |    AS DECIMAL(18,2))) AS DOUBLE), 2) AS avg_winsorized,
        |  ROUND(CAST(SUM(CASE WHEN l.l_extendedprice <>
        |      GREATEST(LEAST(l.l_extendedprice, b.hi), b.lo)
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS clipped_share
        |FROM lineitem l JOIN bounds b USING (l_returnflag)
        |GROUP BY l.l_returnflag""".stripMargin,

    "q_histogram2d" ->
      """SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS bin_qty,
        |  CAST(FLOOR(l_discount * 50) AS BIGINT) AS bin_disc,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_minmax_norm" ->
      """WITH b AS (SELECT o_orderpriority, MIN(o_totalprice) AS lo,
        |    MAX(o_totalprice) AS hi FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderkey, o.o_orderpriority,
        |  CASE WHEN hi <> lo
        |    THEN ROUND((o_totalprice - lo) / (hi - lo), 6) END
        |    AS price_norm
        |FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
        |WHERE o_orderkey < 1000""".stripMargin,

    "q_rare_collapse" ->
      """WITH c AS (SELECT p_type, COUNT(*) AS n FROM part GROUP BY p_type)
        |SELECT CASE WHEN n < 15 THEN 'OTHER' ELSE p_type END AS category,
        |  CAST(SUM(n) AS BIGINT) AS n_parts, COUNT(*) AS n_merged_types
        |FROM c GROUP BY 1""".stripMargin,

    "q_checksum" ->
      """WITH r AS (SELECT md5(CONCAT_WS('|', l_orderkey, l_linenumber,
        |    l_returnflag, l_linestatus)) AS h FROM lineitem),
        |v AS (SELECT
        |    (INSTR('0123456789abcdef', SUBSTRING(h, 1, 1)) - 1) * 1
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 2, 1)) - 1) * 16
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 3, 1)) - 1) * 256
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 4, 1)) - 1) * 4096
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 5, 1)) - 1) * 65536
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 6, 1)) - 1) * 1048576
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 7, 1)) - 1) * 16777216
        |  + (INSTR('0123456789abcdef', SUBSTRING(h, 8, 1)) - 1) * 268435456
        |    AS rv FROM r)
        |SELECT COUNT(*) AS n_rows, CAST(SUM(rv) AS BIGINT) AS sum_check,
        |  CAST(BIT_XOR(rv) AS BIGINT) AS xor_check FROM v""".stripMargin,

    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
        |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |t AS (SELECT e1.a AS wa, e1.b AS wb, e2.b AS wc
        |      FROM e e1 JOIN e e2 ON e1.b = e2.a
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (SELECT wa AS p FROM t UNION ALL SELECT wb FROM t
        |      UNION ALL SELECT wc FROM t)
        |SELECT p AS p_partkey, COUNT(*) AS n_triangles
        |FROM n GROUP BY p
        |ORDER BY n_triangles DESC, p_partkey LIMIT 20""".stripMargin,

    // scaled-integer PageRank: every arithmetic step is exact BIGINT
    // math, so 3 unrolled iterations reproduce the Spark ranks
    // bit-for-bit regardless of partitioning or summation order
    "q_pagerank" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
        |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |ed AS (SELECT a AS u, b AS v FROM e
        |       UNION ALL SELECT b AS u, a AS v FROM e),
        |deg AS (SELECT u, COUNT(*) AS dg FROM ed GROUP BY u),
        |r0 AS (SELECT u, CAST(1000000000 AS BIGINT) AS r FROM deg),
        |r1 AS (SELECT ed.v AS u, CAST(150000000
        |         + (85 * SUM(r0.r // deg.dg)) // 100 AS BIGINT) AS r
        |       FROM ed JOIN r0 ON ed.u = r0.u JOIN deg ON ed.u = deg.u
        |       GROUP BY ed.v),
        |r2 AS (SELECT ed.v AS u, CAST(150000000
        |         + (85 * SUM(r1.r // deg.dg)) // 100 AS BIGINT) AS r
        |       FROM ed JOIN r1 ON ed.u = r1.u JOIN deg ON ed.u = deg.u
        |       GROUP BY ed.v),
        |r3 AS (SELECT ed.v AS u, CAST(150000000
        |         + (85 * SUM(r2.r // deg.dg)) // 100 AS BIGINT) AS r
        |       FROM ed JOIN r2 ON ed.u = r2.u JOIN deg ON ed.u = deg.u
        |       GROUP BY ed.v)
        |SELECT u AS p_partkey, r AS rank_scaled FROM r3
        |ORDER BY r DESC, u LIMIT 20""".stripMargin,

    // deterministic mode-label propagation: 3 unrolled synchronous
    // iterations; per iteration the mode of the neighbors' labels with
    // ties to the smallest label — replayed as count + ROW_NUMBER
    // (n DESC, label ASC) = the lexicographic argmax
    "q_label_prop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
        |      FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |ed AS (SELECT a AS src, b AS dst FROM e
        |       UNION ALL SELECT b AS src, a AS dst FROM e),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
        |l1 AS (SELECT node, label FROM (
        |  SELECT ed.src AS node, l0.label,
        |    ROW_NUMBER() OVER (PARTITION BY ed.src
        |      ORDER BY COUNT(*) DESC, l0.label) AS rk
        |  FROM ed JOIN l0 ON ed.dst = l0.node
        |  GROUP BY ed.src, l0.label) WHERE rk = 1),
        |l2 AS (SELECT node, label FROM (
        |  SELECT ed.src AS node, l1.label,
        |    ROW_NUMBER() OVER (PARTITION BY ed.src
        |      ORDER BY COUNT(*) DESC, l1.label) AS rk
        |  FROM ed JOIN l1 ON ed.dst = l1.node
        |  GROUP BY ed.src, l1.label) WHERE rk = 1),
        |l3 AS (SELECT node, label FROM (
        |  SELECT ed.src AS node, l2.label,
        |    ROW_NUMBER() OVER (PARTITION BY ed.src
        |      ORDER BY COUNT(*) DESC, l2.label) AS rk
        |  FROM ed JOIN l2 ON ed.dst = l2.node
        |  GROUP BY ed.src, l2.label) WHERE rk = 1)
        |SELECT label, COUNT(*) AS n_members FROM l3
        |GROUP BY label ORDER BY n_members DESC, label LIMIT 20""".stripMargin,

    // deterministic k-means: assignment = argmax of round-3 cosine
    // (ties to the smaller cell), centroid update = exact decimal per-
    // dim sums divided once as doubles — 2 unrolled Lloyd iterations
    "q_kmeans" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cell, v AS c FROM e
        |       WHERE vec_id < 8),
        |a1 AS (SELECT vec_id, v, cell FROM (
        |  SELECT e.vec_id, e.v, c0.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      ROUND(LIST_COSINE_SIMILARITY(e.v, c0.c), 3) DESC, c0.cell)
        |      AS rk FROM e, c0) WHERE rk = 1),
        |m1 AS (SELECT cell, dim,
        |    CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS m
        |  FROM (SELECT cell, UNNEST(v) AS x,
        |        GENERATE_SUBSCRIPTS(v, 1) AS dim FROM a1)
        |  GROUP BY cell, dim),
        |c1m AS (SELECT cell, LIST(m ORDER BY dim) AS c FROM m1 GROUP BY cell),
        |c1 AS (SELECT c0.cell, COALESCE(c1m.c, c0.c) AS c
        |       FROM c0 LEFT JOIN c1m USING (cell)),
        |a2 AS (SELECT vec_id, v, cell FROM (
        |  SELECT e.vec_id, e.v, c1.cell,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      ROUND(LIST_COSINE_SIMILARITY(e.v, c1.c), 3) DESC, c1.cell)
        |      AS rk FROM e, c1) WHERE rk = 1),
        |m2 AS (SELECT cell, dim,
        |    CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS m
        |  FROM (SELECT cell, UNNEST(v) AS x,
        |        GENERATE_SUBSCRIPTS(v, 1) AS dim FROM a2)
        |  GROUP BY cell, dim),
        |c2m AS (SELECT cell, LIST(m ORDER BY dim) AS c FROM m2 GROUP BY cell),
        |c2 AS (SELECT c1.cell, COALESCE(c2m.c, c1.c) AS c
        |       FROM c1 LEFT JOIN c2m USING (cell)),
        |a3 AS (SELECT vec_id, cell, s FROM (
        |  SELECT e.vec_id, c2.cell,
        |    ROUND(LIST_COSINE_SIMILARITY(e.v, c2.c), 3) AS s,
        |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |      ROUND(LIST_COSINE_SIMILARITY(e.v, c2.c), 3) DESC, c2.cell)
        |      AS rk FROM e, c2) WHERE rk = 1)
        |SELECT a3.cell, COUNT(*) AS n,
        |  FLOOR((CAST(SUM(CAST(a3.s AS DECIMAL(18,3))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000
        |    AS mean_cos,
        |  FLOOR(ANY_VALUE(c2.c[1]) * 1000000 + 0.5) / 1000000 AS c_first
        |FROM a3 JOIN c2 ON a3.cell = c2.cell
        |GROUP BY a3.cell""".stripMargin,

    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size > p.p_size))""".stripMargin,

    "q_sql_front" ->
      """SELECT n.n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin,

    "q_join_nullsafe" ->
      """WITH e AS (SELECT event_type,
        |    NULLIF(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS INT) % 10, 0) AS bucket
        |  FROM events),
        |a AS (SELECT bucket, COUNT(*) AS n_all FROM e GROUP BY 1),
        |p AS (SELECT bucket, COUNT(*) AS n_purchase FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT a.bucket, a.n_all, COALESCE(p.n_purchase, 0) AS n_purchase
        |FROM a LEFT JOIN p ON a.bucket IS NOT DISTINCT FROM p.bucket""".stripMargin
  )
}
