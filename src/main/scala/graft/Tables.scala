package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated parquet fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * All queries receive the scale-factor directory at call time so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * unchanged, against a 100 TB lake: `spark.read.parquet` produces a
  * `FileScanRDD` whose splits scale with the input
  * (`spark.sql.files.maxPartitionBytes`), and Catalyst pushes filters and
  * prunes columns into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Work-vs-bytes partitioning guard (r12). Fan-out operators (shingle
    * explosion, per-row edit-distance DP, bigram transforms) can be
    * handed ONE task by the bytes-based scan split when their input is
    * small in bytes — serializing minutes of compute while the rest of
    * the host idles (measured: the whole fuzzy-join eval stage and the
    * minhash signature stage each ran single-task at the sf1 point,
    * `run 31.3 s = cpu 31.1 s`). When the plan has fewer partitions
    * than the shuffle width, buy eval parallelism with an
    * explicit-count exchange (explicit so AQE cannot coalesce the
    * ~MB-sized exchange straight back to one partition); when the scan
    * is already wide — any real lake — pass through untouched, because
    * the exchange would be pure I/O waste at 100 TB. */
  private[graft] def scanIsNarrow(df: DataFrame): Boolean =
    df.rdd.getNumPartitions * 2 <
      df.sparkSession.sessionState.conf.numShufflePartitions

  private[graft] def widen(df: DataFrame,
                           key: org.apache.spark.sql.Column): DataFrame =
    if (scanIsNarrow(df))
      df.repartition(
        df.sparkSession.sessionState.conf.numShufflePartitions, key)
    else df

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` drifts across fixture generations: some lakes write parquet
    * TIMESTAMP(NANOS) (which Spark 4 only reads as a long via
    * `nanosAsLong`), others TIMESTAMP_MICROS (read as TIMESTAMP or
    * TIMESTAMP_NTZ depending on `isAdjustedToUTC`). Branch on the schema
    * actually read, and normalize to the same surface either way:
    * `ts` = session-zoned TIMESTAMP at microsecond precision,
    * `ts_ns` = nanos-since-epoch LONG. Nanos truncation uses integer
    * arithmetic (DIV) — a double division would lose precision above
    * 2^53 ns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) file read as raw nanos
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns DIV 1000)"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ file (micros)
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view (for spark.sql queries).
    * `events` must go through [[events]] (nanos-as-long handling). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => table(spark, dir, n).createOrReplaceTempView(n)
    }
}
