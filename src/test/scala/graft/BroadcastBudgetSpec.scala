package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's forced-broadcast budget table is the audit map for the
  * engine's one class of deliberate optimizer bypasses (r12 VERDICT
  * item 7): every `broadcast()` call site must have a declared size
  * model and fallback. This pins the inventory the way DocsCoverageSpec
  * pins the query registry: a NEW source file introducing a forced
  * broadcast fails here until the table names it — the next operator
  * copies the policy instead of re-deriving it. Pure file check. */
class BroadcastBudgetSpec extends AnyFunSuite {

  test("every file with a forced broadcast is named in README's budget table") {
    val repo = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo"))
    val readme = new String(
      java.nio.file.Files.readAllBytes(repo.resolve("README.md")), "UTF-8")
    val header = "### Forced-broadcast budget"
    assert(readme.contains(header), "README budget section missing")
    val section = readme.substring(readme.indexOf(header))
      .split("\n## ", 2).head
    val srcRoot = repo.resolve("src/main/scala")
    val offenders = new scala.collection.mutable.ArrayBuffer[String]()
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // the functions.broadcast hint (not RDD/TorrentBroadcast plumbing)
        if ("""broadcast\(""".r.findFirstIn(text).isDefined &&
            !section.contains(p.getFileName.toString))
          offenders += p.getFileName.toString
      }
    }
    assert(offenders.isEmpty,
      s"forced-broadcast sites missing from README's budget table " +
        s"(add a row with size model + fallback): ${offenders.mkString(", ")}")
  }
}
