package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.text.TextFunctions
import graft.vector.VectorFunctions

/** Persisted standing indexes: build once, serve many (VERDICT r13
  * next-round item 1).
  *
  * Every other near-dup / ANN query in the registry recomputes
  * shingles, minhash signatures, band keys and IVF cells from raw data
  * on every invocation. A real 100 TB pipeline builds that index ONCE
  * and serves every subsequent batch / query set against it — which is
  * literally the reference's provider-side architecture: a precomputed
  * map-output file plus an offset index, built by the map wave and then
  * served to every reducer that asks, with the index itself cached
  * across requests (reference src/MOFServer/IndexInfo.h:98-104, index
  * cache IndexInfo.cc:195-233). The Spark-native analog of "keep the
  * partitioned MOF + index on disk" is a bucketed/partitioned parquet
  * layout whose write-side shuffle is paid once and amortized over
  * every downstream serve ([[Layout]]'s q_bucket_join pattern).
  *
  * Two indexes:
  *
  *  - NEAR-DUP index over the standing document corpus (the fixture
  *    convention q_dedup_incremental established: corpus =
  *    doc_id % 5 ≠ 0, batch = doc_id % 5 = 0). Three bucketed tables:
  *      bands    (band, key, rep)  bucketed+sorted by key — the LSH
  *                                 posting lists, signature-collapsed
  *                                 to one representative per distinct
  *                                 minhash signature (the minhash `gk`
  *                                 skew hardening, so a dup-heavy
  *                                 corpus contributes DISTINCT
  *                                 signatures to a bucket, not corpus
  *                                 multiplicity);
  *      members  (id, rep)         bucketed by rep — expands a rep-
  *                                 level band hit to the group's docs;
  *      shingles (id, n, sh)       bucketed by id — the exact-Jaccard
  *                                 verification sets.
  *    Serving a batch touches the corpus ONLY through these tables:
  *    the batch side shingles/signs/bands itself (it is the small,
  *    new data) and joins in; the corpus is never re-shingled or
  *    re-signed, and — because each table is bucketed on its join
  *    key — a batch too large to broadcast shuffles ONLY itself, the
  *    index side reads exchange-free.
  *
  *  - ANN (IVF) index over the standing embedding corpus: Lloyd-refined
  *    centroids (a small parquet, k×dim — the same bounded driver
  *    round-trip the transient IVF path makes) plus the cell
  *    assignments WITH their vectors, hive-partitioned by cell
  *    ([[Layout.writePartitioned]]). A query probes nProbe cells and
  *    the scan PRUNES to those directories at planning time
  *    (PartitionFilters — the moral equivalent of a reducer fetching
  *    exactly its index slice) — zero corpus re-scan, zero re-signing.
  *
  * Index identity is content-keyed: the tag folds in the source
  * parquet's file sizes+mtimes, so a regenerated-in-place fixture
  * builds a fresh index instead of serving a stale one (the ADVICE r13
  * staleness class). Build wall-times are recorded in [[buildLog]] so
  * the bench artifact can publish build-vs-serve amortization.
  */
object StandingIndex {

  /** Build wall-seconds by index label ("neardup@<tag>" / "ivf@<tag>"),
    * for the bench artifact's amortization record. The seconds are also
    * PERSISTED in each index's marker file, so a session that finds the
    * index already on disk still reports what the build cost — the
    * artifact's build-vs-serve record survives the build happening in
    * an earlier run (exactly the deployment shape the index exists
    * for). */
  val buildLog = new scala.collection.concurrent.TrieMap[String, Double]()

  private def writeMarker(marker: java.io.File, sec: Double): Unit = {
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath,
      f"$sec%.3f".getBytes("UTF-8"))
  }

  private def loadMarker(marker: java.io.File, label: String): Unit =
    try {
      val s = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      if (s.nonEmpty) buildLog.putIfAbsent(label, s.toDouble)
    } catch { case _: Throwable => () } // pre-r14 empty marker: no record

  private def repoRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo")

  /** Content signal of one fixture parquet (dir of part files or a
    * single file): names + sizes + mtimes. Shared staleness primitive —
    * the capped-ANN accuracy fixture and the BroadcastGuard memo keys
    * use the same signal, so all three staleness gates agree on what
    * "same content" means (review r14). */
  private[graft] def contentSig(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(_.isFile).sortBy(_.getName)
        .map(x => s"${x.getName}=${x.length}@${x.lastModified}").mkString(",")
    else s"${f.length}@${f.lastModified}"
  }

  /** 8-hex content tag of `<d>/<table>.parquet` (dir + content signal). */
  private[graft] def tag(d: String, table: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${contentSig(s"$d/$table.parquet")}".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  // ---- near-dup (minhash) index -------------------------------------

  private val NumHashes = 64
  private val Bands = 16
  private val ShingleSize = 3
  private val NdBuckets = 8

  case class NearDupIndex(bands: String, members: String, shingles: String)

  /** (id, sh) distinct word-3-shingle arrays of `docs`, widened for
    * fan-out parallelism when the scan is narrow (the work-vs-bytes
    * rule — see [[Tables.widen]]). */
  private def shingleTable(docs: DataFrame): DataFrame =
    Tables.widen(docs.select(col("doc_id").as("id"), col("text")), col("id"))
      .select(col("id"),
        TextFunctions.shingles(col("text"), ShingleSize).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Band keys of a signature table carrying m0..m63: one codegen'd
    * xxhash64 per band over that band's row slice (the minhashPairs
    * banding, shared verbatim so index and batch agree bit-for-bit). */
  private def bandCols(rows: Int): Seq[org.apache.spark.sql.Column] =
    (0 until Bands).map { j =>
      val cols = (j * rows until (j + 1) * rows).map(i => col(s"m$i"))
      struct(lit(j).as("band"), xxhash64(lit(j) +: cols: _*).as("key"))
    }

  /** The three index tables of one corpus slice — the shared
    * signature-collapse body of build AND append: (bands, members,
    * shingles-with-size). Banding one representative per DISTINCT
    * minhash signature is lossless (members share the signature, so
    * rep-level band collisions are exactly member-level ones) and
    * bounds bucket size by distinct signatures, not corpus
    * multiplicity. */
  private def nearDupTables(corpus: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val sh = shingleTable(corpus)
    val rows = NumHashes / Bands
    val keyed = graft.dedup.Dedup.minhashSignatures(sh, NumHashes)
      .withColumn("gk",
        xxhash64((0 until NumHashes).map(i => col(s"m$i")): _*))
    val aggs = min(col("id")).as("rep") +:
      (0 until NumHashes).map(i => min(col(s"m$i")).as(s"m$i"))
    val groups = keyed.groupBy(col("gk")).agg(aggs.head, aggs.tail: _*)
      .localCheckpoint() // feeds both bands and members below
    val bands = groups
      .select(col("rep"), explode(array(bandCols(rows): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("rep"))
    val members = keyed.select(col("id"), col("gk"))
      .join(groups.select(col("gk"), col("rep")), "gk")
      .select(col("id"), col("rep"))
    (bands, members, sh.select(col("id"), size(col("sh")).as("n"), col("sh")))
  }

  private def buildNearDup(spark: SparkSession, corpus: DataFrame,
                           root: String, idx: NearDupIndex): Unit = {
    val (bands, members, sh) = nearDupTables(corpus)
    Layout.writeBucketed(bands, idx.bands, s"$root/bands",
      NdBuckets, "key", "key")
    Layout.writeBucketed(members, idx.members, s"$root/members",
      NdBuckets, "rep", "rep")
    Layout.writeBucketed(sh, idx.shingles, s"$root/shingles",
      NdBuckets, "id", "id")
  }

  /** Ensure the near-dup index for the standing corpus of `d` exists
    * (building it on first use) and its three tables are registered in
    * this session's catalog; returns the table names. */
  def ensureNearDup(spark: SparkSession, d: String): NearDupIndex = synchronized {
    val t = tag(d, "documents")
    val root = s"$repoRoot/target/standing/nd_$t"
    val idx = NearDupIndex(s"graft_nd_${t}_bands", s"graft_nd_${t}_members",
      s"graft_nd_${t}_shingles")
    val marker = new java.io.File(s"$root/_GRAFT_NDIDX_v1")
    if (!marker.exists()) {
      val t0 = System.nanoTime()
      buildNearDup(spark,
        Tables.documents(spark, d).filter(col("doc_id") % 5 =!= 0), root, idx)
      val sec = (System.nanoTime() - t0) / 1e9
      writeMarker(marker, sec)
      buildLog.put(s"neardup@$t", sec)
    } else {
      loadMarker(marker, s"neardup@$t")
      registerNearDup(spark, root, idx)
    }
    idx
  }

  /** Index MAINTENANCE: the standing index kept current by APPENDING an
    * increment instead of rebuilding — the economics that make
    * build-once/serve-many true over a growing lake. The increment's
    * collapsed signature groups INSERT into the bucketed tables
    * (`insertInto` respects the bucket spec, so serves stay
    * exchange-free); an increment doc whose signature equals a standing
    * group's keeps its own group — recall is unaffected because
    * identical signatures collide on every band, and all candidates are
    * exact-verified anyway. Appended work is proportional to the
    * INCREMENT: the standing corpus is neither re-shingled nor
    * rewritten (plan/scan-asserted in StandingIndexSpec).
    *
    * Fixture slices: standing = doc_id%5 ∈ {1,2}, appended increment =
    * doc_id%5 ∈ {3,4}, probe batch = doc_id%5 = 0 — so the maintained
    * index must answer exactly like a monolithic index over doc_id%5≠0,
    * which is what the oracle (and q_dedup_incremental_near's) checks.
    * Exemplar caveat: the insert itself is not atomic (a crash
    * mid-append leaves partial bucket files); a production deployment
    * stages the increment and swaps, the upsert sink's backup-rename
    * protocol. */
  def ensureNearDupAppended(spark: SparkSession,
                            d: String): NearDupIndex = synchronized {
    val t = tag(d, "documents")
    val root = s"$repoRoot/target/standing/nda_$t"
    val idx = NearDupIndex(s"graft_nda_${t}_bands",
      s"graft_nda_${t}_members", s"graft_nda_${t}_shingles")
    val baseMarker = new java.io.File(s"$root/_GRAFT_NDIDX_v1")
    val appendMarker = new java.io.File(s"$root/_GRAFT_NDIDX_APPEND_v1")
    val docs = Tables.documents(spark, d)
    if (!baseMarker.exists()) {
      val t0 = System.nanoTime()
      buildNearDup(spark, docs.filter((col("doc_id") % 5).isin(1, 2)),
        root, idx)
      val sec = (System.nanoTime() - t0) / 1e9
      writeMarker(baseMarker, sec)
      buildLog.put(s"neardup-base@$t", sec)
    } else {
      loadMarker(baseMarker, s"neardup-base@$t")
      registerNearDup(spark, root, idx)
    }
    if (!appendMarker.exists()) {
      val t0 = System.nanoTime()
      val (bands, members, sh) =
        nearDupTables(docs.filter((col("doc_id") % 5).isin(3, 4)))
      bands.write.insertInto(idx.bands)
      members.write.insertInto(idx.members)
      sh.write.insertInto(idx.shingles)
      val sec = (System.nanoTime() - t0) / 1e9
      writeMarker(appendMarker, sec)
      buildLog.put(s"neardup-append@$t", sec)
    } else loadMarker(appendMarker, s"neardup-append@$t")
    idx
  }

  /** Re-register an on-disk index in a fresh session's catalog (the
    * build session registered it via saveAsTable; metadata does not
    * survive the in-memory catalog, the data does). The bucket spec in
    * the DDL must match [[Layout.writeBucketed]]'s exactly or the
    * exchange-free read contract silently breaks. */
  private def registerNearDup(spark: SparkSession, root: String,
                              idx: NearDupIndex): Unit = {
    def reg(name: String, schema: String, bucketCol: String,
            dir: String): Unit =
      if (!spark.catalog.tableExists(name))
        spark.sql(s"""CREATE TABLE $name ($schema) USING parquet
          |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
          |INTO $NdBuckets BUCKETS
          |LOCATION '$root/$dir'""".stripMargin)
    reg(idx.bands, "band INT, key BIGINT, rep BIGINT", "key", "bands")
    reg(idx.members, "id BIGINT, rep BIGINT", "rep", "members")
    reg(idx.shingles, "id BIGINT, n INT, sh ARRAY<STRING>", "id", "shingles")
  }

  /** Near-dup pairs of the NEW batch (doc_id % 5 = 0) against the
    * standing corpus, via the persisted index — the corpus is never
    * re-shingled or re-signed (plan-asserted in StandingIndexSpec).
    * Returns (doc_id, dup_id, jaccard): batch doc, its corpus near-dup,
    * exact rounded Jaccard ≥ `threshold`.
    *
    * Shape: the batch shingles/signs/bands ITSELF (it is the new
    * data), then joins the index — at this scale the batch side
    * auto-broadcasts into the index scans; a lake-sized batch instead
    * shuffles only itself onto the index's bucket layout (bands
    * bucketed by key, members by rep, shingles by id), the index side
    * exchange-free either way. Every banded candidate is verified with
    * exact Jaccard over the persisted shingle sets, so index
    * parameters affect recall only (miss ≈ 4e-8 at 0.9 — the
    * q_dedup_minhash argument), never precision. */
  def nearDupIncrement(spark: SparkSession, d: String,
                       threshold: Double = 0.9): DataFrame =
    serveNearDup(spark, ensureNearDup(spark, d),
      Tables.documents(spark, d).filter(col("doc_id") % 5 === 0), threshold)

  /** [[nearDupIncrement]] against the APPEND-MAINTAINED index (see
    * [[ensureNearDupAppended]]): the probe batch's answer must equal
    * the monolithic index's — same oracle — while the index itself was
    * built as standing + appended increment. */
  def nearDupAppendServe(spark: SparkSession, d: String,
                         threshold: Double = 0.9): DataFrame =
    serveNearDup(spark, ensureNearDupAppended(spark, d),
      Tables.documents(spark, d).filter(col("doc_id") % 5 === 0), threshold)

  private def serveNearDup(spark: SparkSession, idx: NearDupIndex,
                           batch: DataFrame, threshold: Double): DataFrame = {
    val rows = NumHashes / Bands
    val bsh = shingleTable(batch).localCheckpoint() // bands + verification
    val bBands = graft.dedup.Dedup.minhashSignatures(bsh, NumHashes)
      .select(col("id").as("bid"),
        explode(array(bandCols(rows): _*)).as("bk"))
      .select(col("bid"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candReps = bBands
      .join(spark.table(idx.bands), Seq("band", "key"))
      .select(col("bid"), col("rep"))
      .distinct()
    val cand = candReps
      .join(spark.table(idx.members), "rep")
      .select(col("bid"), col("id").as("cid"))
    cand
      .join(spark.table(idx.shingles)
        .select(col("id").as("cid"), col("n").as("n_c"),
          col("sh").as("sh_c")), "cid")
      .join(bsh.select(col("id").as("bid"), col("sh").as("sh_b")), "bid")
      .withColumn("inter", size(array_intersect(col("sh_b"), col("sh_c"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_b")) + col("n_c") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("bid").as("doc_id"), col("cid").as("dup_id"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  // ---- ANN (IVF) index ----------------------------------------------

  private val NCells = 16
  private val NProbe = 4
  private val KmeansIters = 2

  case class AnnIndex(centroids: String, assignments: String)

  private val assignSchema = StructType(Seq(
    StructField("nid", LongType),
    StructField("cv", ArrayType(DoubleType)),
    StructField("cell", IntegerType)))

  /** Ensure the IVF index over `d`'s embeddings exists; returns paths.
    * Centroids are Lloyd-refined exactly as the transient
    * [[graft.similarity.Ann.ivfTopK]] path refines them — float
    * summation makes them layout-sensitive, which is why the index is
    * recall-gated (ACCURACY), never hash-compared; once PERSISTED,
    * every serve against the same index is deterministic. */
  def ensureAnn(spark: SparkSession, d: String): AnnIndex = synchronized {
    val t = tag(d, "embeddings")
    val root = s"$repoRoot/target/standing/ivf_$t"
    val idx = AnnIndex(s"$root/centroids", s"$root/assignments")
    val marker = new java.io.File(s"$root/_GRAFT_IVFIDX_v1")
    if (marker.exists()) { loadMarker(marker, s"ivf@$t"); return idx }
    val t0 = System.nanoTime()
    val c = Tables.embeddings(spark, d).select(col("vec_id").as("nid"),
      VectorFunctions.asDouble(col("embedding")).as("cv"))
    val seeds: Seq[Seq[Double]] = c.orderBy(col("nid")).limit(NCells)
      .select(col("cv")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    val cents =
      if (seeds.isEmpty) Seq.empty
      else graft.similarity.Ann.refineCentroids(
        c.select(col("cv")), "cv", seeds, KmeansIters)
    import spark.implicits._
    cents.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell", "centroid")
      .write.mode("overwrite").parquet(idx.centroids)
    import graft.expressions.TopCentroidsExpression.topCentroids
    val assigned = c.select(col("nid"), col("cv"),
      element_at(topCentroids(col("cv"), cents, 1), 1).as("cell"))
    Layout.writePartitioned(assigned, idx.assignments, "cell")
    val sec = (System.nanoTime() - t0) / 1e9
    writeMarker(marker, sec)
    buildLog.put(s"ivf@$t", sec)
    idx
  }

  /** Top-k cosine neighbors of the query set (vec_id < 10, matching
    * q_ann_ivf) served from the PERSISTED IVF index: the centroid table
    * read is the one bounded driver round-trip (k×dim doubles, the same
    * trip the transient path makes per invocation), probe cells collect
    * to ≤ nCells ints, and the assignment scan prunes to the probed
    * `cell=` directories at planning time — the corpus is never
    * re-scanned or re-signed. */
  def annServe(spark: SparkSession, d: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idx = ensureAnn(spark, d)
    val q = Tables.embeddings(spark, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"),
        VectorFunctions.asDouble(col("embedding")).as("qv"))
    val cents: Seq[Seq[Double]] = spark.read.parquet(idx.centroids)
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    if (cents.isEmpty)
      // empty corpus → empty index → empty result with the right schema
      return q.select(col("qid"), col("qid").as("nid"),
        lit(0.0).as("cos_sim"), lit(1).as("rk")).limit(0)
    import graft.expressions.TopCentroidsExpression.topCentroids
    val probes = q.select(col("qid"), col("qv"),
      explode(topCentroids(col("qv"), cents, NProbe)).as("cell"))
    // bounded driver scalar: ≤ nCells ints — it becomes the literal IN
    // list the scan's PartitionFilters prune on
    val cells = probes.select(col("cell")).distinct()
      .collect().map(r => Integer.valueOf(r.getInt(0))).toSeq
    val hits = Layout.readPartitioned(spark, idx.assignments, assignSchema)
      .filter(col("cell").isin(cells: _*))
    val scored = probes.join(hits, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos_sim",
        VectorFunctions.cosineRounded(col("qv"), col("cv"), 3))
      .select(col("qid"), col("nid"), col("cos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos_sim"), col("rk"))
  }
}
