package graft

import graft.dedup.{Clusters, Dedup}

/** Connected-components clustering over near-dup pairs. */
class ClustersSpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("multi-hop chain collapses to one component") {
    // path graph 1-2-3-...-10 plus an isolated pair: needs label
    // propagation across 9 hops, not just clique shortcuts
    val edges = ((1L to 9L).map(i => (i, i + 1)) :+ (100L, 101L)).toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 10L).foreach(i => assert(cc(i) == 1L, s"node $i got ${cc(i)}"))
    assert(cc(100L) == 100L && cc(101L) == 100L)
  }

  test("components match driver-side union-find on fixture minhash pairs") {
    val pairs = Dedup.minhashPairs(Tables.documents(spark, sfDir),
      "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16,
      threshold = 0.9)
    val edges = pairs.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(edges.nonEmpty, "fixture produced no near-dup pairs")
    val want = unionFind(edges)
    val got = Clusters.connectedComponents(
      pairs.toDF(), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("string ids cluster too (no silent numeric cast)") {
    val edges = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("x", "y"))
      .toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a",
      "doc-c" -> "doc-a", "x" -> "x", "y" -> "x"), cc.toString)
  }

  test("one label per node even when maxIter stops before the fixpoint") {
    // a 12-node path with maxIter=1: the star rounds cannot finish, but
    // the output must still be WELL-FORMED (exactly one row per node)
    val edges = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Clusters.connectedComponents(edges, "a", "b", maxIter = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.map(_._1).distinct.length == cc.length,
      s"duplicate node labels: ${cc.mkString(",")}")
    assert(cc.map(_._1).toSet == (1L to 12L).toSet)
  }

  test("dupClusters sizes are consistent") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val rows = Clusters.dupClusters(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("keepBest keeps the highest-score member; singletons keep themselves") {
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (10L, 7L), (11L, 3L),
      (99L, 1L)).toDF("doc_id", "score")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val rows = Clusters.keepBest(docs, "doc_id", edges, "a", "b", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // cluster {1,2,3}: 2 and 3 tie on score 50 -> lower id 2 wins;
    // cluster {10,11}: 10 wins on score; 99 is a singleton keeper
    assert(rows == Set((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (99L, 99L, true)))
  }

  test("keepBest emits exactly one keeper per cluster on fixture pairs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val kb = Clusters.keepBest(docs.select(col("doc_id"), col("n_chars")),
      "doc_id", Dedup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.9),
      "doc_a", "doc_b", "n_chars")
    assert(kb.count() == docs.count(), "every doc must be labeled")
    val perCluster = kb.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"))
    assert(perCluster.filter(col("keepers") =!= 1).count() == 0)
  }
}
