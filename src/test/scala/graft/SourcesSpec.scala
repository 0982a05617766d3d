package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink coverage (SURVEY §2.2 "Connectors / file formats"):
  * parquet is the fixture format; csv/json/orc round-trip through the
  * same DataFrame API, with compression codecs on the write path. */
class SourcesSpec extends SparkSuite {

  private lazy val nation = Tables.nation(spark, sfDir)

  test("csv round-trip with header + snappy-compressed parquet") {
    val dir = Files.createTempDirectory("graft_src").toString
    nation.write.option("header", "true").csv(s"$dir/nation_csv")
    val back = spark.read.option("header", "true")
      .schema(nation.schema).csv(s"$dir/nation_csv")
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)

    nation.write.option("compression", "snappy").parquet(s"$dir/nation_pq")
    assert(spark.read.parquet(s"$dir/nation_pq").count() == nation.count())
  }

  test("json round-trip preserves values") {
    val dir = Files.createTempDirectory("graft_json").toString
    nation.write.json(s"$dir/nation_json")
    val back = spark.read.schema(nation.schema).json(s"$dir/nation_json")
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("orc round-trip preserves values") {
    val dir = Files.createTempDirectory("graft_orc").toString
    nation.write.orc(s"$dir/nation_orc")
    val back = spark.read.orc(s"$dir/nation_orc")
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("filter + projection reach the parquet scan (pushdown/pruning)") {
    val q = SparkEntry.queries("q_filter_project")(spark, sfDir)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("GreaterThan(l_quantity,45.0)"), s"no pushdown:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_shipdate"),
      "projection not pruned to needed columns")
  }
}
