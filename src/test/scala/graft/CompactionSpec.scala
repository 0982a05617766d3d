package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Small-file compaction: fewer files, identical content, no shuffle. */
class CompactionSpec extends SparkSuite {

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compact merges small files without changing content") {
    val frag = "/tmp/graft_compact_test/frag"
    val out = "/tmp/graft_compact_test/out"
    val li = Tables.lineitem(spark, sfDir)
    li.repartition(64).write.mode("overwrite").parquet(frag)
    assert(parquetFiles(frag).length == 64)

    Layout.compact(spark, frag, out, targetFileBytes = 4L << 20)

    val nOut = parquetFiles(out).length
    assert(nOut < 8, s"expected few compacted files, got $nOut")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("compaction plan has no exchange (coalesce, not repartition)") {
    val frag = "/tmp/graft_compact_test/frag2"
    Tables.lineitem(spark, sfDir).limit(1000)
      .repartition(16).write.mode("overwrite").parquet(frag)
    val plan = spark.read.parquet(frag).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce must not shuffle:\n$plan")
  }
}
