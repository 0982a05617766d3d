package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's forced-broadcast budget table is the audit map for the
  * engine's one class of deliberate optimizer bypasses (r12 VERDICT
  * item 7): every `broadcast()` call site must have a declared size
  * model and fallback. This pins the inventory the way DocsCoverageSpec
  * pins the query registry, at CALL-SITE granularity (review r13: a
  * filename pin alone could not catch a new unguarded hint added to an
  * already-listed file): comments are stripped before matching, and the
  * expected per-file site count is pinned below — adding a forced
  * broadcast ANYWHERE fails this test until the new site's size model
  * and fallback are declared in the README table and the count here is
  * bumped. Pure file check. */
class BroadcastBudgetSpec extends AnyFunSuite {

  /** Non-comment `broadcast(` call sites per file — the audited
    * inventory behind README's budget table. */
  private val Budget = Map(
    "BroadcastGuard.scala" -> 2, // the guard's own two admission arms
    "ScaleFixture.scala" -> 2, // factor-row replica index (bench tooling)
    "EventsStreaming.scala" -> 1, // stream-static dim enrichment
    "Prefix.scala" -> 3, // one row per bucket carries
    "Upsert.scala" -> 1, // batch key table (upsertSmallSource contract)
    "Ann.scala" -> 6, // query/candidate tables + the guarded re-rank arm
    "Analytics.scala" -> 6, // star dim, per-source/enum stats, frontier
    "LlmOps.scala" -> 7, // enum/global stats + kmeans centroids
    "Relational.scala" -> 6, // TPC-H dims (star-join contract)
    "Shape.scala" -> 1) // event-type dim

  private def stripComments(t: String): String = {
    val noBlocks = """(?s)/\*.*?\*/""".r.replaceAllIn(t, "")
    """//[^\n]*""".r.replaceAllIn(noBlocks, "")
  }

  test("every forced-broadcast call site is budgeted in README's table") {
    val repo = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo"))
    val readme = new String(
      java.nio.file.Files.readAllBytes(repo.resolve("README.md")), "UTF-8")
    val header = "### Forced-broadcast budget"
    assert(readme.contains(header), "README budget section missing")
    val section = readme.substring(readme.indexOf(header))
      .split("\n## ", 2).head
    val srcRoot = repo.resolve("src/main/scala")
    val found = scala.collection.mutable.Map[String, Int]()
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val text = stripComments(new String(
          java.nio.file.Files.readAllBytes(p), "UTF-8"))
        val n = """broadcast\(""".r.findAllIn(text).size
        if (n > 0) found(p.getFileName.toString) = n
      }
    }
    val drift = (found.keySet ++ Budget.keySet).toSeq.sorted.flatMap { f =>
      (found.getOrElse(f, 0), Budget.getOrElse(f, 0)) match {
        case (a, b) if a == b => None
        case (a, b) => Some(s"$f: $a sites vs $b budgeted")
      }
    }
    assert(drift.isEmpty,
      s"forced-broadcast inventory drift — declare each new site's size " +
        s"model + fallback in README's budget table and update Budget " +
        s"here: ${drift.mkString("; ")}")
    val undocumented = found.keySet.filterNot(section.contains)
    assert(undocumented.isEmpty,
      s"files with forced broadcasts missing from README's budget " +
        s"table: ${undocumented.mkString(", ")}")
  }
}
