package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Core relational operator surface (SURVEY.md §2.2): scans, projection,
  * filter, aggregation (hash/sort, distinct, rollup/cube/grouping sets),
  * joins (broadcast/SMJ/semi/anti/outer/range), windows, global sort,
  * top-k, set ops, scalar functions.
  *
  * Design notes for 100 TB scale (every query here is declarative so
  * Catalyst + AQE pick the physical plan):
  *  - dims (region/nation/supplier/part/customer) are broadcast — no
  *    shuffle of the fact table for those joins;
  *  - fact-fact joins shuffle on the join key once and use sort-merge —
  *    the reference's fetch + k-way-merge pipeline
  *    (reference src/Merger/MergeQueue.h:126-270) as Spark implements it;
  *  - aggregations are partial (map-side combine) before the exchange;
  *  - doubles that feed SUM/AVG are cast to DECIMAL(18,2) first so the
  *    result is order-independent and bit-identical to the DuckDB oracle
  *    (double summation order varies with partitioning; decimals don't).
  */
object Relational {

  /** Order-independent money arithmetic: exact decimal, surfaced as double. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  private def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan → filter → partial agg → exchange → final agg → sort ----
    // The flagship: exercises the reference's whole pipeline (SURVEY §7.2).
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- projection + selective filter (parquet pushdown + pruning) ----
    "q_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
    }),

    // ---- global sort (TeraSort analog: range partition + local sort) ----
    "q_sort_global" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- top-k (planned as TakeOrderedAndProject: no global sort) ----
    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)
    }),

    // ---- broadcast hash join: fact ⋈ two dims, no fact shuffle ----
    "q_join_bcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // ---- multi-way star join (TPC-H Q5 shape) ----
    // The canonical warehouse query: two fact tables shuffled on their
    // join key, every dimension broadcast, filters pushed to the scans.
    // Catalyst plans the snowflake (nation→region) reduction before the
    // fact join; at 100 TB the only exchanges are the two fact sides.
    "q_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
    }),

    // ---- OR-condition join, rewritten scale-safe ----
    // A join on (a=x OR b=y) plans as a nested-loop in Spark (no single
    // equi key) — O(|L|·|R|). The standard rewrite: one equi-join per
    // disjunct, union, dedup on the output key. Each leg hash-joins;
    // the plan never contains a cartesian/BNLJ (asserted in
    // PlanShapeSpec).
    "q_join_or" -> ((s, d) => {
      // r16: each table is materialized ONCE (localCheckpoint) — the
      // two disjunct legs used to re-scan both probe tables (guide
      // §1.2: don't compute things twice); and the post-union dedup +
      // per-supplier count share ONE exchange — hash-partitioning on
      // s_suppkey alone satisfies the (s_suppkey, c_custkey) dedup
      // clustering AND the count's grouping, where distinct() +
      // groupBy used to exchange the ~|matches| stream twice (the
      // q_label_prop one-exchange pattern). Same rewrite shape as
      // documented above; result unchanged (oracle-checked).
      val su = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey").cast("int").as("sn"),
          floor(col("s_acctbal") / 1000).cast("long").as("sband"))
        .localCheckpoint()
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey").as("cn"),
          floor(col("c_acctbal") / 1000).cast("long").as("cband"))
        .localCheckpoint()
      val byNation = su.join(c, col("sn") === col("cn"))
      val byCode = su.join(c, col("sband") === col("cband"))
      byNation.select(col("s_suppkey"), col("c_custkey"))
        .union(byCode.select(col("s_suppkey"), col("c_custkey")))
        .repartition(col("s_suppkey"))
        .dropDuplicates("s_suppkey", "c_custkey")
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_matches"))
    }),

    // ---- sort-merge join: two big tables shuffled on the key ----
    "q_join_smj" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).hint("merge")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- shuffled hash join (explicit strategy): same join as
    // q_join_smj but hinted SHUFFLE_HASH — no sort on either side, the
    // build side hashed per partition. The right strategy when one side
    // is much smaller per partition but too big to broadcast; part of
    // proving the engine exposes ALL of Spark's join strategies, not
    // just the planner's defaults.
    "q_join_shash" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).hint("shuffle_hash")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // ---- left semi join (EXISTS) ----
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // ---- left anti join (NOT EXISTS) ----
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // ---- left outer join + null handling ----
    "q_join_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- equi + range predicate join (pushed as SMJ + filter) ----
    "q_join_range" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p),
          col("l_partkey") === col("p_partkey") &&
          col("l_quantity") >= col("p_size") - 5 &&
          col("l_quantity") <= col("p_size") + 5)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"))
    }),

    // ---- group-wise top-k via the custom operator (bounded heaps,
    //      partial pass before the exchange — no per-group full sort) ----
    "q_topk_group" -> ((s, d) => {
      val o = Tables.orders(s, d)
      graft.plans.GroupTopK.topKPerGroup(o,
          Seq(o("o_custkey")),
          Seq(o("o_totalprice").desc, o("o_orderkey").asc), k = 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- salted join (single-hot-key skew; output == plain join) ----
    "q_join_salted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey").as("pk"), col("l_quantity"))
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("pk"), col("p_brand"))
      graft.operators.SkewJoin.saltedJoin(li, p, "pk", salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- window frames: ntile, running first, range-frame count ----
    "q_window_frames" -> ((s, d) => {
      val base = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val runFirst = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // tie-inclusive RANGE frame: deterministic even with equal prices
      val near = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice")).rangeBetween(-1000, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("quartile", ntile(4).over(base))
        .withColumn("first_key", first(col("o_orderkey")).over(runFirst))
        .withColumn("n_close", count(lit(1)).over(near))
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("quartile"), col("first_key"), col("n_close"))
    }),

    // ---- column profiling (data-quality pass): ONE scan computes
    //      nulls/distinct/min/max/avg for every profiled column, then the
    //      single result row is unpivoted — never k scans for k columns ----
    "q_profile" -> ((s, d) => {
      // work-vs-bytes: 4 exact countDistincts expand every row 5× before
      // the partial aggregate; on the single-split fixture scan that
      // entire expansion ran in ONE task (r15: 3.0 s wall, 7.7 CPU-s —
      // activeCores 2.6). Widen on the key first; pass-through on a
      // wide lake scan.
      val li = Tables.widen(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")), col("l_orderkey"))
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(dec(col(c))).cast("double").as(s"${c}__sum")))
      li.agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), explode(array(cols.map(c =>
          struct(lit(c).as("col_name"),
            col(s"${c}__nulls").as("n_nulls"),
            col(s"${c}__distinct").as("n_distinct"),
            col(s"${c}__min").as("min_v"),
            col(s"${c}__max").as("max_v"),
            (col(s"${c}__sum") / col("n_rows")).as("avg_v"))): _*)).as("p"))
        .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
          col("p.n_distinct"), col("p.min_v"), col("p.max_v"), col("p.avg_v"))
    }),

    // ---- distinct aggregation ----
    "q_agg_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- rollup ----
    "q_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- cube ----
    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // ---- grouping sets (SQL surface) ----
    "q_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
              |FROM orders_gs
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
              |                        (o_orderstatus), ())""".stripMargin)
    }),

    // ---- window: ranking within partitions ----
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    }),

    // ---- window: ntile quartiles + partition-wide first_value ----
    // Row-level ntile is only deterministic up to ties, but the per-
    // (flag, quartile) AGGREGATE is exactly deterministic: quartile sizes
    // are fixed by ntile's division rule, and any rows that could swap
    // across a boundary tie on every sort key — same price — so min/max
    // per bucket are unaffected.
    "q_window_ntile" -> ((s, d) => {
      val ord = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
      // first() over the RUNNING frame is the partition's first row for
      // every row — same value as a whole-partition frame without an
      // unboundedFollowing bound (PlanShapeSpec bans those wholesale)
      val wRun = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          first(col("l_extendedprice")).over(wRun).as("fv"))
        .groupBy(col("l_returnflag"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          max(col("fv")).as("flag_min_price"))
    }),

    // ---- lateral correlated subquery (SQL front): top-2 orders per
    // customer by price. Catalyst decorrelates the LATERAL + LIMIT into
    // a window rank over one hash exchange on o_custkey — the same plan
    // as q_window_rank, not a per-customer nested loop.
    "q_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_lat")
      Tables.orders(s, d).createOrReplaceTempView("orders_lat")
      s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
              |FROM customer_lat c,
              |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
              |         WHERE o.o_custkey = c.c_custkey
              |         ORDER BY o_totalprice DESC, o_orderkey
              |         LIMIT 2) t""".stripMargin)
    }),

    // ---- ordered string aggregation (listagg), bounded per group ----
    // Unbounded per-group concat is a straggler/OOM factory at lake
    // scale, so the operator composes a rank cap (top-5 customers by
    // balance — WindowGroupLimit prunes map-side) with Spark 4's native
    // ListAgg WITHIN GROUP: group state is ≤ 5 names, ever.
    "q_string_agg" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_sa")
      s.sql("""WITH r AS (SELECT c_nationkey, c_name,
              |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
              |      ORDER BY c_acctbal DESC, c_custkey) AS rk
              |  FROM customer_sa)
              |SELECT c_nationkey,
              |  listagg(c_name, ',') WITHIN GROUP (ORDER BY rk)
              |    AS top_names
              |FROM r WHERE rk <= 5 GROUP BY c_nationkey""".stripMargin)
    }),

    // ---- window: running aggregate (frame) ----
    "q_window_running" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
      // l_quantity joins the ordering: rows tying on all three contribute
      // identically, making the running-sum output multiset deterministic.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_qty",
          sum(dec(col("l_quantity"))).over(w).cast("double"))
        .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    }),

    // ---- GLOBAL running sum (no partition key): distributed prefix scan ----
    // The built-in formulation (Window.orderBy with no partitionBy) plans an
    // Exchange SinglePartition over the whole fact table — a one-task
    // bottleneck at scale. Prefix.runningSum is the two-phase scan: bucketed
    // local running sums + broadcast exclusive bucket offsets.
    // global example-id assignment: contiguous 1-based row numbers with
    // no SinglePartition over the data (see operators.Prefix) — the
    // sharding step before writing training examples
    "q_rownum_global" -> ((s, d) =>
      graft.operators.Prefix.rowNumber(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber")),
          bucket = (col("l_orderkey") / lit(2000)).cast("long"),
          order = Seq(col("l_orderkey"), col("l_linenumber")),
          out = "rn")
        .select(col("l_orderkey"), col("l_linenumber"), col("rn"))),

    "q_running_global" -> ((s, d) => {
      graft.operators.Prefix.runningSum(
          Tables.lineitem(s, d),
          bucket = (col("l_orderkey") / lit(2000)).cast("long"),
          order = Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          value = dec(col("l_quantity")),
          out = "running_qty")
        .withColumn("running_qty", col("running_qty").cast("double"))
        .select(col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    }),

    // ---- window: lag/lead ----
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("prev_price"))
    }),

    // ---- window: time-RANGE frame (30-day moving count) ----
    // RANGE over an interval — frame membership by event-time value,
    // not row position; ties (same customer, same day) are all in-frame
    // so the result is deterministic
    "q_window_timerange" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_tr")
      s.sql("""SELECT o_custkey, o_orderkey,
              |  COUNT(*) OVER (PARTITION BY o_custkey
              |                 ORDER BY CAST(o_orderdate AS TIMESTAMP)
              |                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
              |                           AND CURRENT ROW) AS n30
              |FROM orders_tr""".stripMargin)
    }),

    // ---- window: distribution functions ----
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderpriority"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
    }),

    // ---- deterministic hash sampling (map-side, engine-portable) ----
    "q_sample_hash" -> ((s, d) =>
      graft.operators.Sampling.hashSample(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")),
        cutHex = "1a", salt = "s0")),

    // ---- batch MERGE/upsert (full-outer form) ----
    "q_upsert" -> ((s, d) => {
      val t = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val updates = t.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", lit(0.0))
      val inserts = t.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          col("c_name"), col("c_acctbal"))
      graft.operators.Upsert.merge(t, updates.union(inserts), Seq("c_custkey"))
    }),

    // ---- incremental aggregate-state maintenance: the mergeable-state
    // pattern (reference analog: partial+final merge of sorted runs) —
    // a per-customer aggregate STATE computed over history (80% of
    // orders by key hash) absorbs a DELTA batch via one full-outer
    // additive merge, with NO rescan of history facts. Counts add;
    // decimal sums add exactly (order-independent). The oracle
    // recomputes from the full table, so merged-state == full-recompute
    // is the verified invariant. At 100 TB the state table is
    // customer-cardinality, the delta batch-sized — the only scan of
    // the big facts is the one that built the state.
    "q_incr_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("t"))
      val state = agg(o.filter(col("o_orderkey") % 10 < 8))
      val delta = agg(o.filter(col("o_orderkey") % 10 >= 8))
      state.as("s").join(delta.as("dd"), Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("s.n"), lit(0L)) + coalesce(col("dd.n"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("s.t"), dec(lit(0))) + coalesce(col("dd.t"), dec(lit(0))))
            .cast("double").as("total_price"))
    }),

    // ---- recursive CTE: gap-filled monthly series ----
    // Generate-and-left-join is the standard gap-filling reporting
    // pattern; the recursive seed is 12 rows on the driver side of a
    // broadcast join, the order aggregate is an ordinary partial+final
    // groupBy — recursion depth is bounded by the calendar, not the data.
    "q_cte_recursive" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """WITH RECURSIVE months(m) AS (
          |  SELECT DATE'1995-01-01'
          |  UNION ALL SELECT add_months(m, 1) FROM months
          |  WHERE m < DATE'1995-12-01'
          |)
          |SELECT date_format(m, 'yyyy-MM') AS month,
          |       COALESCE(t.n, 0) AS n_orders,
          |       COALESCE(t.sum_price, 0.0) AS sum_price
          |FROM months LEFT JOIN (
          |  SELECT date_format(o_orderdate, 'yyyy-MM') AS month2,
          |         COUNT(*) AS n,
          |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |           AS sum_price
          |  FROM orders_v WHERE year(o_orderdate) = 1995
          |  GROUP BY 1) t
          |ON date_format(m, 'yyyy-MM') = t.month2""".stripMargin)
    }),

    // ---- approximate heavy hitters (sketch top-k) ----
    // approx_top_k tracks maxItemsTracked items per partition and merges
    // sketches — one pass, fixed memory, no full groupBy at scale. With
    // cardinality below maxItemsTracked the sketch is exact (asserted in
    // the accuracy artifact); counts at true 100 TB cardinality are
    // approximate, which is the operator's contract.
    "q_approx_topk" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT item AS l_partkey, count AS n
          |FROM (SELECT inline(approx_top_k(l_partkey, 20, 100000))
          |      FROM lineitem_v)""".stripMargin)
    }),

    // ---- set ops ----
    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
      c.union(su).distinct().orderBy(col("nk"))
    }),
    "q_set_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
      c.intersect(su).orderBy(col("nk"))
    }),
    "q_set_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
      c.except(su).orderBy(col("nk"))
    }),

    // ---- scalar functions: string ----
    "q_scalar_string" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          col("p_name").contains("a").cast("int").as("has_a"))
    }),

    // ---- scalar functions: date ----
    "q_scalar_date" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
    }),

    // ---- scalar functions: math ----
    "q_scalar_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_discount") * 100).as("disc_pct"),
          pmod(col("l_orderkey"), lit(7)).as("k_mod7"))
    }),

    // ---- scalar functions: array ops over tokenized text ----
    "q_scalar_array" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).as("n"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_join(slice(col("toks"), 1, 3), "_").as("head3"),
          array_contains(col("toks"), "the").cast("int").as("has_the"),
          size(array_distinct(col("toks"))).as("n_distinct"))
    }),

    // ---- scalar functions: regular expressions ----
    "q_scalar_regex" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        size(regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("n_words"),
        col("p_name").rlike("^[a-m]").cast("int").as("starts_early"))
    }),

    // ---- IN subquery (planned as a semi join) ----
    "q_in_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_in")
      Tables.customer(s, d).createOrReplaceTempView("customer_in")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders_in
              |WHERE o_custkey IN (SELECT c_custkey FROM customer_in
              |                    WHERE c_mktsegment = 'BUILDING')
              |GROUP BY o_orderpriority""".stripMargin)
    }),

    // ---- semi-structured: regexp extraction from JSON-ish props ----
    "q_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
    }),

    // ---- sketch re-aggregation: the 100 TB rollup pattern ----
    // Quantile sketch per group (KLL-style; fixed memory, mergeable):
    // accuracy-artifact-checked against exact percentiles. No SQL
    // oracle — sketch internals are engine-specific by design.
    "q_approx_percentile" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
            .as("p50_qty"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000))
            .as("p90_price"))),

    // DataSketches HLL built per (nation, segment), PERSISTED to parquet
    // as a binary column, then read back and UNIONED across segments —
    // partial aggregates as first-class stored DATA, re-aggregated
    // without touching the raw rows again. This is how a 100 TB pipeline
    // serves distinct-counts at every rollup level from one scan: the
    // sketch table is thousands of rows, the fact re-scan is zero.
    "q_hll_union" -> ((s, d) => {
      val skPath = s"/tmp/graft_layout/${java.lang.Integer.toHexString(d.hashCode)}/cust_sketches"
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
        .write.mode("overwrite").parquet(skPath)
      s.read.parquet(skPath)
        .groupBy(col("c_nationkey"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("approx_customers"))
    }),

    // ---- map columns: parse → explode(map) → re-aggregate ----
    // MapType round-trip over semi-structured payloads: from_json to a
    // typed map, generator-explode to (key, value) rows, aggregate per
    // key. All map-side until the final partial+final aggregate.
    "q_map_ops" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(col("event_id"), explode(col("m")))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          max(col("value")).as("max_v"))),

    // ---- typed UDAF (exact weighted average, order-free buffer) ----
    "q_udaf" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_u")
      s.sql("""SELECT l_returnflag,
              |  graft_wavg(l_extendedprice, l_quantity) AS wavg_price
              |FROM lineitem_u GROUP BY l_returnflag""".stripMargin)
    }),

    // ---- native Catalyst aggregate (TypedImperativeAggregate) ----
    // bounded k-heap per group; the shuffle carries <=k doubles per
    // (task, group), never rows — see expressions.TopKValuesAggregate
    "q_topk_vals" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_tv")
      // try_element_at: a group with fewer than k values yields NULL for
      // the missing ranks (matching the oracle's MAX(CASE WHEN rk=n...)),
      // instead of INVALID_ARRAY_INDEX on a degenerate corpus
      s.sql("""SELECT l_returnflag,
              |  try_element_at(t, 1) AS t1, try_element_at(t, 2) AS t2,
              |  try_element_at(t, 3) AS t3
              |FROM (SELECT l_returnflag,
              |        graft_topk_vals(l_extendedprice, 3) AS t
              |      FROM lineitem_tv GROUP BY l_returnflag)""".stripMargin)
    }),

    // ---- scalar UDF surface (deliberately; expressions are preferred) ----
    "q_udf" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_u2")
      s.sql("""SELECT graft_qty_band(l_quantity) AS band, COUNT(*) AS n
              |FROM lineitem_u2 GROUP BY graft_qty_band(l_quantity)""".stripMargin)
    }),

    // ---- exact percentiles (sort-based aggregate) ----
    // work-vs-bytes: percentile's PARTIAL aggregate buffers every value,
    // and a single-split scan builds all of it in one task (r15 profile:
    // activeCores ~1.5 on the percentile family). Project to the three
    // needed columns, then widen — pass-through on a wide lake scan.
    "q_percentile" -> ((s, d) => {
      Tables.widen(Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"),
            col("l_extendedprice"), col("l_orderkey")), col("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 3).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 3).as("p90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 3).as("price_p25"))
    }),

    // ---- approximate distinct (HLL++ sketch; no SQL oracle — sketch
    //      implementations differ across engines, accuracy is asserted
    //      against the exact count in the test suite) ----
    "q_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
    }),

    // ---- pivot (wide aggregation) ----
    "q_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // ---- scalar subquery ----
    "q_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_sq")
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders_sq
              |WHERE o_totalprice > 2 * (
              |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              |         / COUNT(*) FROM orders_sq)""".stripMargin)
    }),

    // ---- conditional expressions ----
    "q_conditional" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") > 40, "bulk")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("small").as("qty_band"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("rf"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
    }),

    // ---- array aggregation (collect + sort, emitted as string) ----
    "q_array_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .groupBy(col("l_orderkey"))
        .agg(array_join(sort_array(collect_list(col("l_quantity").cast("int"))), ",")
          .as("quantities"),
          count(lit(1)).as("n"))
    }),

    // ---- union all (bag semantics) ----
    "q_set_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
      c.union(su).groupBy(col("nk")).agg(count(lit(1)).as("n"))
    }),

    // ---- UDTF surface: custom Generator via LATERAL VIEW ----
    "q_udtf" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .createOrReplaceTempView("docs_udtf")
      s.sql("""SELECT doc_id, pos, shingle FROM docs_udtf
              |LATERAL VIEW graft_posexplode_shingles(text, 3) g AS pos, shingle""".stripMargin)
    }),

    // ---- wordcount (the reference's regression workload; KV shuffle) ----
    "q_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q_sort_global" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_join_bcast" ->
      """SELECT p_brand, s_nationkey, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_nationkey""".stripMargin,

    "q_star_join" ->
      """SELECT n_name, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(EXTRACT(year FROM o_orderdate) AS INT) = 1995
        |GROUP BY n_name""".stripMargin,

    "q_join_or" ->
      """SELECT s_suppkey, COUNT(*) AS n_matches FROM (
        |  SELECT DISTINCT s_suppkey, c_custkey
        |  FROM supplier, customer
        |  WHERE CAST(s_nationkey AS INT) = c_nationkey
        |     OR CAST(FLOOR(s_acctbal / 1000) AS BIGINT)
        |      = CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) t
        |GROUP BY s_suppkey""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q_join_shash" ->
      """SELECT o_orderstatus, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "q_join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 250000.0)""".stripMargin,

    "q_join_outer" ->
      """SELECT c_nationkey, COUNT(o_orderkey) AS n_orders, COUNT(*) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey""".stripMargin,

    "q_join_range" ->
      """SELECT p_brand, COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
        |GROUP BY p_brand""".stripMargin,

    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) AS t WHERE rk <= 3""".stripMargin,

    "q_join_salted" ->
      """SELECT p_brand, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q_window_frames" ->
      """SELECT o_orderkey, o_orderpriority, quartile, first_key, n_close
        |FROM (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |                        ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
        |    FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_close
        |  FROM orders) AS t
        |WHERE o_orderkey < 1000""".stripMargin,

    "q_profile" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v,
           |  CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_v
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), ())""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) AS t WHERE rk <= 3""".stripMargin,

    "q_window_ntile" ->
      """WITH w AS (SELECT l_returnflag, l_extendedprice,
        |    NTILE(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |      AS quartile,
        |    FIRST_VALUE(l_extendedprice) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS fv
        |  FROM lineitem)
        |SELECT l_returnflag, quartile, COUNT(*) AS n,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  MAX(fv) AS flag_min_price
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         LIMIT 2) t""".stripMargin,

    "q_string_agg" ->
      """WITH r AS (SELECT c_nationkey, c_name,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer)
        |SELECT c_nationkey,
        |  STRING_AGG(c_name, ',' ORDER BY rk) AS top_names
        |FROM r WHERE rk <= 5 GROUP BY c_nationkey""".stripMargin,

    "q_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem""".stripMargin,

    "q_rownum_global" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |FROM lineitem""".stripMargin,

    "q_running_global" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (ORDER BY l_orderkey, l_linenumber, l_quantity
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin,

    "q_window_timerange" ->
      """SELECT o_custkey, o_orderkey,
        |  COUNT(*) OVER (PARTITION BY o_custkey
        |                 ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING
        |                           AND CURRENT ROW) AS n30
        |FROM orders""".stripMargin,

    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |  PERCENT_RANK() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice, o_orderkey) AS pr,
        |  CUME_DIST() OVER (PARTITION BY o_orderpriority
        |                    ORDER BY o_totalprice, o_orderkey) AS cd,
        |  CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |                      ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        |FROM orders""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE SUBSTRING(md5(CONCAT(CONCAT_WS('-', l_orderkey, l_linenumber),
        |                           's0')), 1, 2) < '1a'""".stripMargin,

    "q_upsert" ->
      """WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |src AS (
        |  SELECT c_custkey, c_name, CAST(0 AS DOUBLE) AS c_acctbal
        |  FROM t WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_acctbal
        |  FROM t WHERE c_custkey % 13 = 0)
        |SELECT * FROM src
        |UNION ALL
        |SELECT * FROM t
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM src)""".stripMargin,

    // the invariant under test: incremental state + delta merge must
    // equal a full recompute over all facts
    "q_incr_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price
        |FROM orders GROUP BY o_custkey""".stripMargin,

    "q_cte_recursive" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        |  WHERE m < DATE '1995-12-01'
        |)
        |SELECT STRFTIME(m, '%Y-%m') AS month,
        |  COALESCE(t.n, 0) AS n_orders,
        |  COALESCE(t.sum_price, 0.0) AS sum_price
        |FROM months LEFT JOIN (
        |  SELECT STRFTIME(o_orderdate, '%Y-%m') AS month2, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |  FROM orders WHERE CAST(EXTRACT(year FROM o_orderdate) AS INT) = 1995
        |  GROUP BY 1) t ON STRFTIME(m, '%Y-%m') = t.month2""".stripMargin,

    // q_approx_topk: no SQL oracle — heavy count ties at the top-20
    // boundary make MEMBERSHIP ambiguous (any engine may pick a
    // different tied item), so equality is asserted tie-insensitively
    // on the count multiset in the accuracy artifact instead.

    "q_set_union" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS INT) AS nk FROM supplier) AS t
        |ORDER BY nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_set_except" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        |ORDER BY nk""".stripMargin,

    "q_scalar_string" ->
      """SELECT p_partkey, UPPER(p_brand) AS brand_u, LENGTH(p_name) AS name_len,
        |  SUBSTRING(p_type, 1, 5) AS type_pfx,
        |  CONCAT_WS('|', p_brand, p_type) AS bt,
        |  CAST(CONTAINS(p_name, 'a') AS INT) AS has_a
        |FROM part""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS dom,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS ds
        |FROM orders""".stripMargin,

    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_quantity - 25) AS dev,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct,
        |  l_orderkey % 7 AS k_mod7
        |FROM lineitem""".stripMargin,

    "q_scalar_array" ->
      """SELECT doc_id,
        |  LEN(STRING_SPLIT(text, ' ')) AS n,
        |  STRING_SPLIT(text, ' ')[1] AS first_tok,
        |  STRING_SPLIT(text, ' ')[-1] AS last_tok,
        |  ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:3], '_') AS head3,
        |  CAST(LIST_CONTAINS(STRING_SPLIT(text, ' '), 'the') AS INT) AS has_the,
        |  LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct
        |FROM documents WHERE doc_id < 200""".stripMargin,

    "q_scalar_regex" ->
      """SELECT p_partkey,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS consonants,
        |  REGEXP_EXTRACT(p_type, '^(\w+)', 1) AS type_head,
        |  LEN(REGEXP_EXTRACT_ALL(p_name, '[a-z]+')) AS n_words,
        |  CAST(REGEXP_MATCHES(p_name, '^[a-m]') AS INT) AS starts_early
        |FROM part""".stripMargin,

    "q_in_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS INT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q_map_ops" ->
      """SELECT 'k' AS key, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_v,
        |  MAX(CAST(props->>'$.k' AS INT)) AS max_v
        |FROM events
        |WHERE props->>'$.k' IS NOT NULL""".stripMargin,

    "q_udaf" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
        |           * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS DOUBLE) / 100
        |    / CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS DOUBLE)
        |    AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_topk_vals" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
        |             ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                                ORDER BY l_extendedprice DESC) AS rk
        |           FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rk = 1 THEN l_extendedprice END) AS t1,
        |  MAX(CASE WHEN rk = 2 THEN l_extendedprice END) AS t2,
        |  MAX(CASE WHEN rk = 3 THEN l_extendedprice END) AS t3
        |FROM r GROUP BY l_returnflag""".stripMargin,

    "q_udf" ->
      """SELECT CASE WHEN l_quantity > 40 THEN 'bulk'
        |            WHEN l_quantity > 10 THEN 'mid'
        |            ELSE 'small' END AS band, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY 1""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 3) AS p50,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.9), 3) AS p90,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 3) AS price_p25
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |  COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A,
        |  COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N,
        |  COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 2 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) FROM orders)""".stripMargin,

    "q_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity > 40 THEN 'bulk'
        |       WHEN l_quantity > 10 THEN 'mid'
        |       ELSE 'small' END AS qty_band,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf,
        |  GREATEST(l_tax, l_discount) AS max_rate,
        |  LEAST(l_tax, l_discount) AS min_rate
        |FROM lineitem""".stripMargin,

    "q_array_agg" ->
      """SELECT l_orderkey,
        |  ARRAY_TO_STRING(LIST_SORT(LIST(CAST(l_quantity AS INT))), ',') AS quantities,
        |  COUNT(*) AS n
        |FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey""".stripMargin,

    "q_set_union_all" ->
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |  UNION ALL SELECT CAST(s_nationkey AS INT) AS nk FROM supplier) AS t
        |GROUP BY nk""".stripMargin,

    // positions are first-occurrence ranks of DISTINCT shingles, mirrored
    // via MIN(i) + ROW_NUMBER in DuckDB (list_distinct's order is
    // unspecified there, so order is reconstructed explicitly)
    "q_udtf" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ts
        |           FROM documents WHERE doc_id < 50),
        |raw AS (SELECT doc_id, i, ARRAY_TO_STRING(ts[i:i+2], ' ') AS shingle
        |        FROM d, UNNEST(RANGE(1, LEN(ts)-1)) AS t(i)
        |        WHERE LEN(ts) >= 3),
        |f AS (SELECT doc_id, shingle, MIN(i) AS fi
        |      FROM raw GROUP BY doc_id, shingle)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fi) - 1 AS INT) AS pos,
        |  shingle
        |FROM f""".stripMargin,

    "q_wordcount" ->
      """SELECT tok, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) AS t
        |WHERE tok <> '' GROUP BY tok""".stripMargin
  )
}
