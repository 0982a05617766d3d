package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving for multi-dimension data clustering.
  *
  * Sorting a table by `interleave(x, y)` places rows close in BOTH
  * dimensions into the same parquet files, so per-file min/max stats
  * prune scans filtered on either column (or both) — the multi-dim
  * generalization of the reference's one-dimensional partition index
  * (reference src/MOFServer/IndexInfo.h:98-121): instead of "fetch only
  * your reduce partition", "read only the files whose stat range
  * intersects the predicate".
  *
  * The spread is the standard 5-step mask-shift Morton encoding — no
  * loops, fully inlined by whole-stage codegen. Inputs use their low 32
  * bits; callers with wider/negative/non-uniform keys should rank or
  * bucketize first (clustering quality, not correctness, is at stake).
  */
object ZOrder {
  /** Spread the low 32 bits of `v` to the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code: bits of `a` on even positions, `b` on odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZOrderExpression {
  def interleaveBits(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))
}
