package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join: for every left row, attach the payload of the
  * latest right row whose timestamp is ≤ the left row's timestamp, within
  * the same key group. The operator Spark lacks natively (SURVEY §7.4).
  *
  * Implementation is the union + ordered-window trick rather than a
  * per-key lookup join:
  *   1. tag left rows side=1, right rows side=0, union them;
  *   2. one hash exchange on the keys + one sort on (ts, side, tiebreak)
  *      — exactly a sort-merge join's cost envelope, which is what the
  *      reference's k-way merge machinery would execute;
  *   3. `last(right_payload, ignoreNulls)` over the growing frame gives
  *      each left row the most recent right payload at or before its ts.
  *
  * Scale: ONE shuffle of |L|+|R| rows, no row explosion (a naive
  * range-join would produce |L|×|R_match| intermediates), AQE handles
  * key skew. Right rows at the exact left timestamp sort before the left
  * row (side 0 < 1) — inclusive `>=` semantics, matching DuckDB ASOF.
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String],
                   tiebreak: Option[String] = None): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(rightPayload.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    def tb(df: DataFrame): Column =
      tiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L))

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"), tb(left).as("__tb"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"), tb(right).as("__tb"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__match"))
  }

  /** Nearest as-of: attach the right row whose timestamp is CLOSEST to
    * the left row's, in either direction (ties → the backward match,
    * matching DuckDB's `ASOF` convention of preferring the ≤ side when
    * both distances are equal). One union + one hash exchange on the
    * keys; the backward and forward lookups are two window passes over
    * the SAME partitioning (Spark reuses the exchange, re-sorts once per
    * direction) — still the sort-merge-join cost envelope, never a row
    * explosion. The match struct carries `__rts` (the matched right
    * timestamp) so callers can surface the distance. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String],
                  tiebreak: Option[String] = None): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(
      (rightPayload.map(col) :+ col(rightTs).as("__rts")).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    def tb(df: DataFrame): Column =
      tiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L))

    // right=0 / left=1: ascending (ts, side) puts an equal-ts right row
    // BEFORE the left row — inclusive >= for the backward scan; the
    // forward scan orders ts DESC but side ASC so the equal-ts right row
    // again precedes the left row — inclusive <=.
    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"), tb(left).as("__tb"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"), tb(right).as("__tb"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side"), col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val both = l2.unionByName(r2)
      .withColumn("__back", last(col("__r"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", last(col("__r"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)

    val dBack = unix_micros(col("__ts")) - unix_micros(col("__back.__rts"))
    val dFwd = unix_micros(col("__fwd.__rts")) - unix_micros(col("__ts"))
    both
      .withColumn("__match",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(dBack <= dFwd, col("__back"))
          .otherwise(col("__fwd")))
      .select(col("__l.*"), col("__match"))
  }

  /** Forward as-of: attach the EARLIEST right row at or after the left
    * row's timestamp (the "next event" lookup — e.g. first response
    * following a request). Same single-shuffle envelope, mirrored: left
    * sorts BEFORE right at equal ts (side 0 < 1 with left=0 here) so
    * `>=` is inclusive. The forward lookup runs over a DESCENDING-order
    * window with a running [unbounded preceding, current] frame —
    * `last(ignoreNulls)` of the reversed sequence IS the next match —
    * because a [current, unbounded following] frame makes WindowExec
    * recompute the aggregate per row: O(group²), the q_interp lesson.
    * Harmless on small per-key groups, a straggler factory on a hot key. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String],
                  tiebreak: Option[String] = None): DataFrame = {
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(rightPayload.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    def tb(df: DataFrame): Column =
      tiebreak.map(c => col(c).cast("long")).getOrElse(lit(0L))

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(0).as("__side"), tb(left).as("__tb"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(1).as("__side"), tb(right).as("__tb"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").desc, col("__tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(col("__l.*"), col("__match"))
  }
}
