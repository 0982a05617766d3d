package graft

/** Every query must execute (not throw) on an EMPTY corpus with the
  * fixture schemas — the incremental-pipeline edge case (a scheduled run
  * where no new data arrived) that surfaces first()/head-on-empty,
  * null aggregate bounds, and schema-less empty writes at 100 TB scale.
  * Row counts are free to be zero; crashing is the bug. */
class EmptyInputSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = "/tmp/graft_empty_fixtures"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val oneRowDir: String = {
    val dir = "/tmp/graft_onerow_fixtures"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
    }

  test("all queries run to completion on an empty corpus") {
    val failures = sweep(emptyDir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n${failures.mkString("\n")}")
  }

  private lazy val dupDocsDir: String = {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft_dupdocs_fixtures"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = if (t == "documents") {
        // 200 byte-identical copies of one doc under distinct ids — the
        // 100%-duplicate corpus every dedup/banding/inverted-index query
        // must survive (completion, not values, is the gate here)
        val proto = df.orderBy(col("doc_id")).limit(1).drop("doc_id")
        spark.range(200).select(col("id").as("doc_id")).crossJoin(proto)
          .select(df.columns.map(col).toIndexedSeq: _*)
      } else df
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries run to completion on an all-duplicates document corpus") {
    val failures = sweep(dupDocsDir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on all-dup docs:\n${failures.mkString("\n")}")
  }

  test("all queries run to completion on a single-row corpus") {
    // the other degenerate layout: one row per table surfaces
    // window-over-one-row, stddev/corr-of-one (null), log2(1)=0,
    // single-anchor interpolation, and self-join-with-yourself edges
    // that an empty corpus short-circuits past
    val failures = sweep(oneRowDir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on single-row input:\n${failures.mkString("\n")}")
  }
}
