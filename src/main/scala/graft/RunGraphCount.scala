package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: direct-count adjudication of the graph scale legs
  * (q_triangles, q_label_prop) — the [[RunAnnCount]] pattern. Wall
  * clocks on this host lie under hypervisor stalls, but the WORKLOAD of
  * each leg is a deterministic function of the fixture, countable in
  * one cheap aggregate per point:
  *
  *  - triangles (edge-iterator close): work per oriented edge (u,v) is
  *    the sorted-merge walk outdeg(u) + outdeg(v). The summed walk
  *    length across all oriented edges IS the leg's compute, exactly
  *    (every probe the exec makes is one step of some merge walk).
  *  - label propagation: each iteration joins the doubled edge list to
  *    the label vector (2|E| message rows) and aggregates them into
  *    #distinct (node, neighbor-label) groups, then argmaxes those.
  *    Messages + group cardinalities per iteration are the workload.
  *
  * If those counts grow ∝ factor between sf0.1 / sf1 / sf3 (the
  * ScaleFixture is disjoint-replica with constant degree, so they
  * should — that is the design claim), then any super-linear WALL
  * exponent on these legs is measurement noise, adjudicated by the
  * fixture's own numbers rather than by re-running on a quieter host.
  *
  * Usage: RunGraphCount [dir ...] (defaults to the bench's three scale
  * points). Prints one line per dir plus a ratio summary.
  */
object RunGraphCount {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1",
        "/root/repo/target/scale/sf1", "/root/repo/target/scale/sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.local.dir", LocalDirs.dir)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Counts(dir: String, nodes: Long, edges: Long,
                      walkSteps: Long, triangles: Long,
                      lpaMessagesPerIter: Long, lpaGroups: Seq[Long])
    val rows = dirs.map { d =>
      val e = graft.queries.Analytics.copurchaseEdges(spark, d)
      val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).cast("int").as("deg"))
      val nodes = deg.count()
      val edges = e.count()
      // the same degree orientation q_triangles uses
      val fwd = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val ed = e
        .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
        .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
          when(fwd, col("b")).otherwise(col("a")).as("v"))
        .localCheckpoint()
      val outdeg = ed.groupBy(col("u")).agg(count(lit(1)).as("od"))
      // Σ over oriented edges of outdeg(u) + outdeg(v) — the exact
      // number of merge-walk steps the SortedIntIntersect close makes
      val walkSteps = ed
        .join(outdeg.select(col("u"), col("od").as("du")), "u")
        .join(outdeg.select(col("u").as("v"), col("od").as("dv")),
          Seq("v"), "left")
        .agg(sum(col("du") + coalesce(col("dv"), lit(0L))))
        .head().getLong(0)
      val adj = ed.groupBy(col("u"))
        .agg(sort_array(collect_list(col("v"))).as("nbrs"))
        .localCheckpoint()
      val triangles = ed
        .join(adj.hint("shuffle_hash").select(col("u"), col("nbrs").as("nu")), "u")
        .join(adj.hint("shuffle_hash")
          .select(col("u").as("v"), col("nbrs").as("nv")), "v")
        .select(explode(graft.expressions.SortedIntIntersect(
          col("nu"), col("nv"))).as("wc"))
        .count()
      // LPA workload per iteration: 2|E| message rows into the count
      // agg, then the per-iteration group cardinality into the argmax
      val und = e.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint()
      var labels = und.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      val groups = (1 to 3).map { _ =>
        val counted = und
          .join(labels.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val g = counted.count()
        labels = counted.groupBy(col("src"))
          .agg(max_by(col("label"),
            struct(col("n"), (-col("label")).as("nl"))).as("label"))
          .select(col("src").as("node"), col("label"))
          .localCheckpoint()
        g
      }
      val c = Counts(d, nodes, edges, walkSteps, triangles,
        2L * edges, groups)
      println(f"dir=${c.dir} nodes=${c.nodes} edges=${c.edges} " +
        f"tri_walk_steps=${c.walkSteps} triangles=${c.triangles} " +
        f"lpa_messages_per_iter=${c.lpaMessagesPerIter} " +
        s"lpa_groups_per_iter=${c.lpaGroups.mkString(",")}")
      c
    }
    rows.headOption.foreach { base =>
      rows.drop(1).foreach { r =>
        def ratio(f: Counts => Long): String =
          if (f(base) == 0) "n/a" else f"${f(r).toDouble / f(base)}%.2f"
        println(s"ratio ${r.dir} / ${base.dir}: " +
          s"edges=${ratio(_.edges)} tri_walk_steps=${ratio(_.walkSteps)} " +
          s"triangles=${ratio(_.triangles)} " +
          s"lpa_messages=${ratio(_.lpaMessagesPerIter)} " +
          s"lpa_groups_i3=${ratio(_.lpaGroups.last)}")
      }
    }
    spark.stop()
  }
}
