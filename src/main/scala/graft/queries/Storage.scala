package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.sources.Layout

/** Storage-layout operators: partitioned writes with pruned reads, and
  * bucketed writes with exchange-free joins (see [[graft.sources.Layout]]
  * for the reference mapping). Each query WRITES the layout it then
  * reads, so the whole write→prune / write→co-located-join path is
  * exercised by the CORRECTNESS gate, with the oracle running against
  * the original flat table.
  */
object Storage {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Scratch root, keyed by the sf dir so sf0.01 and sf0.1 runs in one
    * session never collide. */
  private def scratch(d: String): String =
    s"/tmp/graft_layout/${java.lang.Integer.toHexString(d.hashCode)}"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // partitioned write → partition-pruned read: the filter on the
    // partition column eliminates whole directories at planning time
    "q_part_prune" -> ((s, d) => {
      val path = s"${scratch(d)}/orders_by_status"
      val orders = Tables.orders(s, d)
      Layout.writePartitioned(orders, path, "o_orderstatus")
      Layout.readPartitioned(s, path, orders.schema)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // z-ordered write → multi-dim min/max file skipping: the read is
    // filtered on the SECOND clustering column, which a single-column
    // sort layout cannot prune (see ZOrderSpec for the file-count
    // comparison); correctness vs the flat-table oracle
    "q_zorder" -> ((s, d) => {
      val path = s"${scratch(d)}/lineitem_z"
      Layout.writeZOrdered(Tables.lineitem(s, d), path, 16,
        col("l_orderkey"), col("l_partkey"))
      s.read.parquet(path)
        .filter(col("l_partkey") < 50)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // dynamic partition pruning: the fact is partitioned on the join
    // key; the dim filter is only known at RUNTIME (it reaches the fact
    // scan as a dynamicpruning subquery reusing the broadcast), so only
    // the matching partition directories are ever read — the runtime
    // analog of q_part_prune's static pruning, and the reference's
    // fetch-only-your-slice index contract under a join.
    "q_dpp" -> ((s, d) => {
      import s.implicits._
      val path = s"${scratch(d)}/orders_by_prio"
      val orders = Tables.orders(s, d)
      Layout.writePartitioned(orders, path, "o_orderpriority")
      // the dim must be a FILE source: a filter over an in-memory
      // LocalRelation constant-folds away before the PartitionPruning
      // rule looks for a selective predicate, and no DPP is inserted
      val dimPath = s"${scratch(d)}/prio_dim"
      Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
        ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")).toDF("prio", "tier")
        .write.mode("overwrite").parquet(dimPath)
      Layout.readPartitioned(s, path, orders.schema)
        .join(s.read.parquet(dimPath).filter(col("tier") === "hot"),
          col("o_orderpriority") === col("prio"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // schema evolution: two parquet batches written at different times
    // with different schemas (the later one adds a column) are read as
    // ONE table with mergeSchema — the old batch surfaces NULL for the
    // new column. Long-lived 100 TB datasets accrete columns; a reader
    // that can't span schema versions forces full rewrites.
    "q_schema_evolve" -> ((s, d) => {
      val base = s"${scratch(d)}/orders_evolve"
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$base/b1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$base/b2")
      s.read.option("mergeSchema", "true").parquet(s"$base/b1", s"$base/b2")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // small-file compaction: a fragmented write (64 tiny files — the
    // shape streaming micro-batch sinks produce) is rewritten to
    // ~4 MiB target files with coalesce (file merge, NO shuffle); the
    // read + aggregate over the compacted copy must match the flat
    // oracle, proving compaction is content-preserving
    "q_compact" -> ((s, d) => {
      val fragPath = s"${scratch(d)}/lineitem_frag"
      val compactPath = s"${scratch(d)}/lineitem_compact"
      Tables.lineitem(s, d).repartition(64)
        .write.mode("overwrite").parquet(fragPath)
      Layout.compact(s, fragPath, compactPath, targetFileBytes = 4L << 20)
      s.read.parquet(compactPath)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // bucketed write on the join key → sort-merge join with NO exchange
    // on either side (both tables pre-bucketed into the same 8 buckets)
    "q_bucket_join" -> ((s, d) => {
      val tag = java.lang.Integer.toHexString(d.hashCode)
      val co = s"cust_b_$tag"
      val oo = s"ord_b_$tag"
      Layout.writeBucketed(Tables.customer(s, d), co,
        s"${scratch(d)}/$co", 8, "c_custkey", "c_custkey")
      Layout.writeBucketed(Tables.orders(s, d), oo,
        s"${scratch(d)}/$oo", 8, "o_custkey", "o_custkey")
      s.table(co).join(s.table(oo), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),

    // the reference's own wire format as a table: lineitem serialized
    // to VInt-framed binary KV records (graft-ifile, byte-compat with
    // Hadoop WritableUtils — IFileSpec), read back, decoded and
    // aggregated; the oracle runs on the original parquet, so a single
    // mis-framed length or lost record hash-mismatches
    "q_ifile_roundtrip" -> ((s, d) => {
      val path = s"${scratch(d)}/lineitem_ifile"
      Tables.lineitem(s, d).select(
        unhex(lpad(hex(col("l_orderkey")), 16, "0")).as("key"),
        encode(concat(col("l_returnflag"), col("l_linestatus"),
          repeat(lit("x"), col("l_linenumber"))), "UTF-8").as("value"))
        .write.format("graft-ifile").mode("overwrite").save(path)
      s.read.format("graft-ifile").load(path)
        .select(conv(hex(col("key")), 16, 10).cast("long").as("k"),
          decode(col("value"), "UTF-8").as("v"))
        .groupBy(pmod(col("k"), lit(7L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_key"),
          sum(length(col("v")).cast("long")).as("sum_len"),
          sum(ascii(substring(col("v"), 1, 1)).cast("long")).as("sum_ascii"))
    }),

    // same wire format through the COMPRESSED + SPLITTABLE path: one
    // coalesced zstd-block file with a dense .idx sidecar, read back as
    // multiple range partitions (max.split.bytes far below the file
    // size); the oracle is the same parquet aggregate, so a torn block,
    // a record lost at a split boundary, or a double-read all
    // hash-mismatch
    "q_ifile_compressed" -> ((s, d) => {
      val path = s"${scratch(d)}/lineitem_ifile_zstd"
      Tables.lineitem(s, d).select(
        unhex(lpad(hex(col("l_orderkey")), 16, "0")).as("key"),
        encode(concat(col("l_returnflag"), col("l_linestatus"),
          repeat(lit("x"), col("l_linenumber"))), "UTF-8").as("value"))
        .coalesce(1)
        .write.format("graft-ifile")
        .option("compression", "zstd")
        .option("block.size.bytes", "8192")
        .option("index.interval.bytes", "16384")
        .mode("overwrite").save(path)
      s.read.format("graft-ifile")
        .option("max.split.bytes", "65536").load(path)
        .select(conv(hex(col("key")), 16, 10).cast("long").as("k"),
          decode(col("value"), "UTF-8").as("v"))
        .groupBy(pmod(col("k"), lit(7L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_key"),
          sum(length(col("v")).cast("long")).as("sum_len"),
          sum(ascii(substring(col("v"), 1, 1)).cast("long")).as("sum_ascii"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_part_prune" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,

    "q_zorder" ->
      """SELECT l_partkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE l_partkey < 50
        |GROUP BY l_partkey""".stripMargin,

    "q_dpp" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin,

    "q_schema_evolve" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM (SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END
        |        AS o_orderstatus, o_totalprice
        |      FROM orders) t
        |GROUP BY o_orderstatus""".stripMargin,

    "q_compact" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,

    "q_bucket_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_ifile_roundtrip" ->
      """SELECT l_orderkey % 7 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        |  CAST(SUM(2 + l_linenumber) AS BIGINT) AS sum_len,
        |  CAST(SUM(ASCII(l_returnflag)) AS BIGINT) AS sum_ascii
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_ifile_compressed" ->
      """SELECT l_orderkey % 7 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        |  CAST(SUM(2 + l_linenumber) AS BIGINT) AS sum_len,
        |  CAST(SUM(ASCII(l_returnflag)) AS BIGINT) AS sum_ascii
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
