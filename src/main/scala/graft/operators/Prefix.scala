package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix scan (running aggregate with NO partition key).
  *
  * Spark's built-in `Window.orderBy(...)` with no `partitionBy` plans an
  * `Exchange SinglePartition`: the entire dataset funnels through ONE task —
  * the same "all runs into one consumer" shape the reference's network-
  * levitated merge exists to make fast on one node
  * (reference src/Merger/MergeManager.cc:184-193), and exactly what does NOT
  * survive a 1000-executor cluster.
  *
  * This operator is the classic two-phase scan, kept fully declarative so
  * whole-stage codegen applies end to end:
  *
  *   1. bucket each row map-side with a MONOTONE function of the leading
  *      order key (caller-supplied, e.g. `l_orderkey div 2000`) — bucket
  *      count grows with the data, so no task sees more than one bucket's
  *      rows;
  *   2. local running aggregate per bucket — one hash exchange on the
  *      bucket key (scalable), ordinary partitioned window;
  *   3. per-bucket totals — map-side partial aggregation, so the second
  *      pass shuffles only ~one row per bucket;
  *   4. exclusive prefix of the totals — a single-partition window over
  *      #buckets rows (KB, not TB: this is the only SinglePartition in the
  *      plan and it is bounded by bucket count, not data size);
  *   5. broadcast-join the offsets back and add.
  *
  * Ties: rows equal on ALL order columns contribute identical values, so the
  * output multiset is deterministic regardless of intra-tie order (the same
  * argument that makes `q_window_running` oracle-checkable). The caller must
  * pass an order that is deterministic up to value-identical ties, and a
  * bucket expression that is a function of the LEADING order column only, so
  * bucket boundaries never split a tie group across buckets incorrectly.
  *
  * Skew: one hot leading-key value lands in one bucket — identical caveat to
  * any partitioned window; pick a bucket width that keeps buckets balanced.
  */
object Prefix {

  /** Running `sum(value)` over `order`, globally, distributed via `bucket`.
    *
    * @param bucket monotone non-decreasing function of the leading order
    *               column (e.g. `col("k") div 2000`)
    * @param order  total order for the scan (deterministic up to ties that
    *               agree on `value`)
    * @param value  summand; pass a decimal-cast column for exact,
    *               order-independent accumulation
    * @param out    name of the produced running-sum column
    */
  /** Global contiguous 1-based row numbering under `order` — the
    * sharding/example-id assignment step of a training-data pipeline
    * (and the degenerate prefix scan: value ≡ 1). Same distribution
    * contract as [[runningSum]]; `order` must be a total order (unique
    * keys) for the numbering to be deterministic. */
  def rowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
                out: String): DataFrame =
    runningSum(df, bucket, order, lit(1L), out)

  /** Global forward fill (`last(value) ignore nulls` over `order`, no
    * partition key) — the same two-phase scan as [[runningSum]] but with
    * the carry being "last non-null value of any prior bucket" instead of
    * a sum of totals. Replaces the `Window.orderBy` single-partition fill
    * in unkeyed gap-fill: the only SinglePartition stage is over one row
    * per bucket. `order` must be a total order within a bucket (unique
    * keys) so the per-bucket last value is deterministic.
    *
    * `bucket` MUST be a monotone non-decreasing function of the leading
    * `order` column (e.g. `col("ts") div width`) — same contract as
    * [[runningSum]]. The carry window orders buckets by bucket VALUE
    * alone, so a non-monotone bucket (a hash bucket, say) would carry
    * "last value of a lower-numbered bucket", not "last value of an
    * earlier one" — silently wrong fills, no error raised.
    */
  def fillForward(df: DataFrame, bucket: Column, order: Seq[Column],
                  value: String, out: String): DataFrame = {
    val b = df.withColumn("_gbucket", bucket)

    // (2) within-bucket forward fill — scalable exchange on the bucket key.
    val wLocal = Window.partitionBy(col("_gbucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("_lfill",
      last(col(value), ignoreNulls = true).over(wLocal))

    // (3) per-bucket last NON-NULL value: max_by skips rows whose ordering
    // expression is null, so null-value rows never win; a bucket that is
    // all nulls still emits a row (with a null last) so the carry window
    // sees every bucket. Partial+final aggregate, ~one row per bucket.
    val lasts = b.groupBy(col("_gbucket"))
      .agg(max_by(col(value),
        when(col(value).isNotNull, struct(order: _*))).as("_blast"))

    // (4) exclusive carry: last non-null value of any PRIOR bucket — the
    // only SinglePartition, over #buckets rows.
    val wOff = Window.orderBy(col("_gbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = lasts
      .withColumn("_bcarry", last(col("_blast"), ignoreNulls = true).over(wOff))
      .select(col("_gbucket"), col("_bcarry"))

    // (5) broadcast carries back; the bucket-local fill wins when present.
    local.join(broadcast(carry), Seq("_gbucket"))
      .withColumn(out, coalesce(col("_lfill"), col("_bcarry")))
      .drop("_gbucket", "_lfill", "_bcarry")
  }

  /** Global running `max(value)` over `order` — same two-phase scan as
    * [[runningSum]] (one scalable exchange on the bucket key; the only
    * SinglePartition is over ~one row per bucket). With
    * `inclusive = false` the scan is STRICT: each row sees the max of
    * rows strictly BEFORE it in the global order (first row → null) —
    * the dominance test a skyline/Pareto-frontier operator needs.
    * Strictness is at ROW granularity within a bucket but the
    * cross-bucket carry is whole-prior-buckets, so callers needing
    * strict semantics across ties must pre-aggregate to one row per
    * distinct leading-order value (as `q_skyline` does per price). */
  def runningMax(df: DataFrame, bucket: Column, order: Seq[Column],
                 value: Column, out: String,
                 inclusive: Boolean = true): DataFrame = {
    val b = df.withColumn("_gbucket", bucket)

    val hi = if (inclusive) Window.currentRow else -1L
    val wLocal = Window.partitionBy(col("_gbucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    val local = b.withColumn("_lmax", max(value).over(wLocal))

    // per-bucket max — partial+final aggregate, ~one row per bucket
    val totals = b.groupBy(col("_gbucket")).agg(max(value).as("_bmax"))

    // exclusive carry: max of any PRIOR bucket (the only SinglePartition)
    val wOff = Window.orderBy(col("_gbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_boff", max(col("_bmax")).over(wOff))
      .select(col("_gbucket"), col("_boff"))

    local.join(broadcast(offsets), Seq("_gbucket"))
      // greatest() ignores nulls, so a null local (strict first row) or a
      // null carry (first bucket) falls back to the other side; both null
      // -> null, the correct "nothing precedes" answer.
      .withColumn(out, greatest(col("_lmax"), col("_boff")))
      .drop("_gbucket", "_lmax", "_boff")
  }

  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
                 value: Column, out: String): DataFrame = {
    val b = df.withColumn("_gbucket", bucket)

    // (2) local running sum within each bucket — scalable exchange.
    val wLocal = Window.partitionBy(col("_gbucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("_lrun", sum(value).over(wLocal))

    // (3) per-bucket totals: partial-aggregated map-side, so this branch
    // re-scans the (column-pruned) source but shuffles ~one row per bucket.
    // (Reusing the window's exchange instead would recompute the window for
    // the totals branch; a pruned re-scan is the cheaper side of that trade.)
    val totals = b.groupBy(col("_gbucket")).agg(sum(value).as("_btot"))

    // (4) exclusive prefix over #buckets rows — the only SinglePartition.
    val wOff = Window.orderBy(col("_gbucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("_boff", sum(col("_btot")).over(wOff))
      .select(col("_gbucket"), col("_boff"))

    // (5) broadcast offsets back; first bucket has no predecessor -> 0.
    local
      .join(broadcast(offsets), Seq("_gbucket"))
      .withColumn(out, col("_lrun") + coalesce(col("_boff"), lit(0)))
      .drop("_gbucket", "_lrun", "_boff")
  }
}
