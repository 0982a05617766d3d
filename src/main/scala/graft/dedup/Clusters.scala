package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (from MinHash/SimHash/
  * embedding banding) → connected components → one canonical
  * representative per cluster. This is the step that turns pairwise
  * dedup output into an actionable keep/drop list: a training-data
  * pipeline drops every member of a component except its representative.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round
  * rewires edges toward the neighborhood minimum:
  *  - large-star: every node links its strictly-larger neighbors to the
  *    minimum of its neighborhood (including itself);
  *  - small-star: every node and its smaller neighbors all link to that
  *    minimum.
  * The fixpoint is a forest of stars whose centers are the component
  * minima, reached in O(log^2 n) rounds REGARDLESS of component
  * diameter — unlike min-label propagation, whose round count grows
  * with the longest chain in the pair graph (pathological at 100 TB:
  * a chain of borderline near-dups makes diameter, not log n, the
  * round bound).
  *
  * Scale notes:
  *  - each round is two groupBy-min + two joins over the EDGE table
  *    (bounded by the near-dup pair count, orders of magnitude smaller
  *    than the corpus), all declarative — nothing is collected and
  *    nothing is broadcast;
  *  - edge counts are non-increasing round over round (stars only
  *    shrink), so the first round bounds every intermediate;
  *  - `localCheckpoint` after each round truncates lineage, or Catalyst
  *    re-analysis cost grows quadratically with iteration count (the
  *    standard iterative-DataFrame pattern; swap for `checkpoint(dir)`
  *    on a real cluster if executor loss during the loop matters);
  *  - convergence is detected by a constant-size fingerprint aggregate
  *    (edge count + hash sum) — the driver loop carries two longs per
  *    round, no data.
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges`.
    * Returns (id, comp) with `comp` = min node id in the component.
    * Nodes appearing only in self-pairs label themselves. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    // ids keep their own type: greatest/least/min and xxhash64 are
    // defined for any orderable column (a cast to long would silently
    // null out string ids)
    //
    // Materialized ONCE, up front: `edges` is typically the tail of a
    // whole near-dup pipeline (shingle → signature → band join) whose
    // cost dwarfs everything below. Both derived tables (the node set
    // and the oriented edge set) used to carry their own eager
    // localCheckpoint, which evaluated that pair lineage TWICE per
    // query — the r15 profile showed q_dup_clusters at ~82 CPU-s vs
    // q_dedup_minhash's ~30 for the identical pair stage.
    val raw = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .localCheckpoint(true)

    // Every labeled node, kept aside so self-pair-only nodes still get a
    // (singleton) component at the end. Derived lazily from the `raw`
    // checkpoint — only consumed by the final label join.
    val nodes = raw.select(col("u").as("id"))
      .union(raw.select(col("v").as("id")))
      .distinct()

    // Orient big→small and drop self-loops; this is already the
    // invariant both star steps emit, so round 1 sees canonical input.
    var e = raw.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    // Probabilistic set-equality check between rounds: (count, XOR of
    // 64-bit edge hashes — order-independent and overflow-free under
    // ANSI; the edge set is distinct so self-cancellation cannot hide a
    // change of the same cardinality except by 2^-64 collision, and
    // `maxIter` backstops even that). Replaces a join-against-previous-
    // labels job per round.
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = (-1L, -1L)
    var cur = fingerprint(e)
    var iter = 0
    while (cur != prev && iter < maxIter) {
      // large-star: m(u) = min(neighborhood(u) ∪ {u}); every neighbor
      // v > u links to m. Emitted edges are (v, m) with v > m, so the
      // big→small orientation is preserved by construction.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = sym.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // small-star: edges are oriented u > v, so every neighbor of u in
      // this direction is "small"; u and all of them link to the min.
      val ssMin = large.groupBy("u").agg(min("v").as("m"))
      val withM = large.join(ssMin, "u")
      e = withM.select(col("u"), col("m").as("v"))
        .union(withM.select(col("v").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)

      prev = cur
      cur = fingerprint(e)
      iter += 1
    }

    if (cur != prev)
      System.err.println(s"[graft] connectedComponents: maxIter=$maxIter " +
        "reached before the star fixpoint — labels below are the best " +
        "lower bound, components may still be split")

    // Fixpoint: a union of stars (leaf u → center v = component min).
    // The min-aggregate (not distinct) keeps the output WELL-FORMED —
    // exactly one label per node — even if the loop exited via maxIter
    // with some node still pointing at two provisional centers.
    val labels = e.select(col("u").as("id"), col("v").as("comp"))
      .union(e.select(col("v").as("id"), col("v").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** (doc_id, cluster_id, cluster_size) for every doc in some near-dup
    * pair; cluster_id = min doc id in the component. The size join is
    * left to the planner (AQE broadcasts it when it is actually small
    * — one row per COMPONENT, which is unbounded at lake scale, so a
    * forced broadcast would be a driver OOM). */
  def dupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val sizes = cc.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        col("cluster_size"))
  }

  /** Full-corpus keep/drop list — the artifact a dedup pipeline actually
    * applies to the lake. Every doc gets its cluster label (docs in no
    * near-dup pair are their own singleton cluster) and `keep` = true
    * iff the doc is the cluster's representative: highest `scoreCol`,
    * ties to the lowest id (the "keep the longest copy" rule).
    *
    * Scale: the label join is id→comp on the (small) paired subset via
    * a left join the planner can broadcast when pairs are sparse; the
    * representative pick is one row_number over cluster-sized window
    * partitions (bounded by the largest duplicate cluster, never the
    * corpus). `docs` should be pre-projected to (id, score) — document
    * payloads stay out of both the shuffle and the window sort. */
  def keepBest(docs: DataFrame, idCol: String, pairs: DataFrame,
               srcCol: String, dstCol: String, scoreCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .select(col("id").as(idCol), col("comp"))
    val labeled = docs.join(cc, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol)))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    labeled.withColumn("rk", row_number().over(w))
      .select(col(idCol), col("cluster_id"), (col("rk") === 1).as("keep"))
  }
}
