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

  test("zstd and lz4 parquet codecs round-trip") {
    val dir = Files.createTempDirectory("graft_codec").toString
    Seq("zstd", "lz4").foreach { codec =>
      nation.write.option("compression", codec).parquet(s"$dir/$codec")
      val back = spark.read.parquet(s"$dir/$codec")
      assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty,
        s"$codec round-trip mismatch")
    }
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

  test("text round-trip: one line per document") {
    val dir = Files.createTempDirectory("graft_src").toString
    val docs = Tables.documents(spark, sfDir).select(col("text"))
      .filter(!col("text").contains("\n"))
    docs.write.text(s"$dir/docs_txt")
    val back = spark.read.text(s"$dir/docs_txt")
      .select(col("value").as("text"))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("filter + projection reach the parquet scan (pushdown/pruning)") {
    val q = SparkEntry.queries("q_filter_project")(spark, sfDir)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [") &&
      scan.contains("GreaterThan(l_quantity,45.0)"), s"no pushdown:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_shipdate"),
      "projection not pruned to needed columns")
  }

  test("partitioned write + read prunes partitions at planning time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val orders = Tables.orders(spark, sfDir)
    graft.sources.Layout.writePartitioned(orders, s"$dir/o", "o_orderstatus")
    val pruned = spark.read.parquet(s"$dir/o")
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"no partition pruning:\n$plan")
    assert(pruned.count() ==
      orders.filter(col("o_orderstatus") === "F").count())
    // pruning actually skipped files: only the F directory is scanned
    assert(!plan.contains("o_orderstatus=O") ||
      plan.contains("PartitionFilters: [isnotnull(o_orderstatus"))
  }

  test("PERMISSIVE json ingest captures corrupt records instead of failing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_badrec").toString
    Seq("""{"k": 1, "v": "ok"}""", """{"k": 2 "v": MALFORMED""",
      """{"k": 3, "v": "fine"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = "k INT, v STRING, _corrupt STRING"
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .cache() // corrupt-record column must not be the only column queried
    try {
      assert(parsed.filter(col("_corrupt").isNotNull).count() == 1,
        "exactly the malformed line is quarantined")
      assert(parsed.filter(col("_corrupt").isNull).count() == 2,
        "good rows parse")
      // FAILFAST on the same input throws — the promote-or-die variant
      intercept[Exception] {
        spark.read.schema("k INT, v STRING").option("mode", "FAILFAST")
          .json(dir).collect()
      }
    } finally parsed.unpersist()
  }

  test("bucketed write on join key: join runs with no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val dir = Files.createTempDirectory("graft_bucket").toString
    graft.sources.Layout.writeBucketed(Tables.customer(spark, sfDir),
      "cust_spec_b", s"$dir/c", 4, "c_custkey", "c_custkey")
    graft.sources.Layout.writeBucketed(Tables.orders(spark, sfDir),
      "ord_spec_b", s"$dir/o", 4, "o_custkey", "o_custkey")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("cust_spec_b")
        .join(spark.table("ord_spec_b"), col("c_custkey") === col("o_custkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      val flat = Tables.customer(spark, sfDir).join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      assert(joined.count() == flat.count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
