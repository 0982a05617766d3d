package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Each module pairs a Spark
  * (DataFrame-API) implementation with an equivalent DuckDB SQL oracle;
  * queries without an oracle entry get the driver's weaker rows-only check
  * (hash-seeded algorithms like MinHash/SimHash that DuckDB can't replay).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmOps.queries ++
      graft.queries.EventsOps.queries ++ graft.queries.Storage.queries ++
      graft.queries.Analytics.queries ++ graft.queries.Shape.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.LlmOps.oracles ++
      graft.queries.EventsOps.oracles ++ graft.queries.Storage.oracles ++
      graft.queries.Analytics.oracles ++ graft.queries.Shape.oracles
}
