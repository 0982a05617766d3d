package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The engine must run unchanged on a swapped-in ShuffleManager (the
  * reference's RDMA-plugin plug point). Runs shuffle-heavy queries under
  * `spark.shuffle.manager=org.apache.spark.shuffle.graft.GraftShuffleManager`
  * and compares results to the default manager.
  *
  * NOT a SparkSuite: the shuffle manager is a SparkContext-construction
  * setting, so this spec builds (and stops) its own sessions. Suites run
  * sequentially in the forked test JVM; later suites getOrCreate a fresh
  * context.
  */
class ShuffleSeamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def runWith(shuffleManager: Option[String]): Map[String, Array[String]] = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    shuffleManager.foreach(b.config("spark.shuffle.manager", _))
    val spark = b.getOrCreate()
    try {
      Seq("q1_agg", "q_join_smj", "q_wordcount").map { q =>
        val rows = SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toString).sorted
        q -> rows
      }.toMap
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("queries produce identical results under GraftShuffleManager") {
    val graft = runWith(
      Some("org.apache.spark.shuffle.graft.GraftShuffleManager"))
    val default = runWith(None)
    default.foreach { case (q, expected) =>
      assert(expected.nonEmpty, s"$q returned no rows")
      assert(graft(q).sameElements(expected), s"$q differs under graft shuffle")
    }
  }

  test("queries survive injected mid-fetch shuffle failures with task retry") {
    import org.apache.spark.shuffle.graft.FaultInjection
    val expected = runWith(None)

    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // local[4, 3]: 3 task attempts — the injected failures burn at most
    // two attempts of any one task before the armed counter runs dry
    val spark = SparkSession.builder()
      .master("local[4, 3]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.FaultInjectingShuffleManager")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Seq("q1_agg", "q_join_smj", "q_wordcount").foreach { q =>
        FaultInjection.arm(2)
        val rows = SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toString).sorted
        assert(FaultInjection.injected.get() >= 1,
          s"$q: fault never fired — test is vacuous " +
            "(did the plan lose its shuffle?)")
        assert(rows.sameElements(expected(q)),
          s"$q differs after injected shuffle failure + retry")
      }
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
