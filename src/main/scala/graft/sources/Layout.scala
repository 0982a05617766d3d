package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout: partitioned and bucketed parquet writes.
  *
  * This is the batch-sink analog of the reference's provider-side
  * layout — one data file per map task plus a partition index that
  * lets a reducer fetch exactly its slice
  * (reference src/MOFServer/IndexInfo.h:98-121, IndexInfo.cc:237-335):
  *  - `partitionBy` writes hive-style `col=value/` directories; a
  *    filter on the partition column prunes whole directories at
  *    planning time (PartitionFilters in the scan — never opens the
  *    files), the moral equivalent of fetching only your index slice.
  *  - `bucketBy(+sortBy)` pre-shuffles (and pre-sorts) rows into a
  *    fixed number of hash buckets at WRITE time, so a later join or
  *    aggregation on the bucket key runs with NO exchange — the
  *    write-side shuffle is paid once and amortized over every
  *    downstream query, exactly the reference's motivation for keeping
  *    reduce-partitioned MOFs on the provider.
  */
object Layout {

  /** Hive-style partitioned parquet write; reads with a filter on any
    * `partitionCols` prune directories at planning time. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read a [[writePartitioned]] layout with an explicit schema. A
    * partitioned write of ZERO rows produces no files at all (there is
    * no directory to hang a schema on), so a schema-inferring read
    * throws UNABLE_TO_INFER_SCHEMA — the empty-increment run every
    * scheduled pipeline eventually hits. Passing the writer's schema
    * keeps the read total; partition pruning on dir names still applies
    * (PartitionFilters are orthogonal to how the schema was obtained). */
  def readPartitioned(spark: SparkSession, path: String,
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  /** Small-file compaction: rewrite `inPath` as ~`targetFileBytes`-sized
    * files. Long-running ingest (streaming micro-batches, per-task MOF
    * output — the reference keeps one file per map task,
    * src/MOFServer/IndexInfo.h:98-121) accretes thousands of tiny files
    * whose per-file open/footer cost dominates scans at 100 TB; periodic
    * compaction is the standard fix. Uses `coalesce`, NOT `repartition`:
    * merging files needs no row redistribution, so no shuffle — each
    * output task just concatenates a set of input files. Returns the
    * output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long): Int = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Z-ordered parquet write: range-partition + sort on the Morton code
    * of two clustering columns, so each output file covers a compact
    * rectangle in (x, y) space and parquet min/max stats prune scans
    * filtered on EITHER column (see [[graft.expressions.ZOrder]]).
    * `files` bounds output file count (the range partitioner's bucket
    * count); at cluster scale pick it from target file size. */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
                    clusterCols: org.apache.spark.sql.Column*): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_z",
        graft.expressions.ZOrderExpression.interleaveBitsN(clusterCols: _*))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed (+ optionally sorted) parquet table at an explicit path.
    * Bucket metadata lives in the session catalog, so read back with
    * `spark.table(tableName)` — a raw path read would not know the
    * bucketing and would re-shuffle. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    numBuckets: Int, bucketCol: String,
                    sortCols: String*): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.format("parquet").saveAsTable(tableName)
  }
}
