package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (from MinHash/SimHash/
  * embedding banding) → connected components → one canonical
  * representative per cluster. This is the step that turns pairwise
  * dedup output into an actionable keep/drop list: a training-data
  * pipeline drops every member of a component except its representative.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the minimum component label among itself and its neighbors;
  * fixpoint = connected components, in O(diameter) rounds. Duplicate
  * clusters are near-cliques (every member pairs with most others), so
  * the diameter is tiny — 2-4 rounds in practice; `maxIter` bounds
  * pathological chains.
  *
  * Scale notes:
  *  - each round is two hash joins + a min-aggregate over the LABEL
  *    table (one row per node that appears in some pair — orders of
  *    magnitude smaller than the corpus), all declarative;
  *  - `localCheckpoint` after each round truncates lineage, or Catalyst
  *    re-analysis cost grows quadratically with iteration count (the
  *    standard iterative-DataFrame pattern; swap for `checkpoint(dir)`
  *    on a real cluster if executor loss during the loop matters);
  *  - the driver loop carries only a convergence COUNT per round —
  *    no data is collected.
  */
object Clusters {

  /** Connected components of the undirected graph given by `edges`.
    * Returns (id, comp) with `comp` = min node id in the component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE: `edges` is typically the tail of a
    // whole near-dup pipeline (shingle → signature → band join), and an
    // un-checkpointed `sym` would re-run that pipeline on every round.
    val sym = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("vc")), "v")
        .groupBy(col("u"))
        .agg(min(col("vc")).as("nc"))
      // Keep the previous label alongside the new one so convergence is a
      // filter over the just-materialized checkpoint — not a separate
      // join-against-old-labels job per round.
      val next = labels
        .join(nbrMin.select(col("u").as("id"), col("nc")), Seq("id"), "left")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select(col("id"), col("comp"))
      iter += 1
    }
    labels
  }

  /** (doc_id, cluster_id, cluster_size) for every doc in some near-dup
    * pair; cluster_id = min doc id in the component. */
  def dupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val sizes = cc.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    cc.join(broadcast(sizes), "comp")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
        col("cluster_size"))
  }
}
