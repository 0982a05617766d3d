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

  /** N-dimensional Morton code: bit j of dimension i lands at position
    * j*n + i, using the low 64/n bits of each value. The general form
    * for clustering on 3+ columns (2-D callers get the mask-shift fast
    * path above via [[InterleaveBits]]). */
  def interleaveN(vs: Array[Long]): Long = {
    val n = vs.length
    val bitsPer = 64 / n
    var out = 0L
    var j = 0
    while (j < bitsPer) {
      var i = 0
      while (i < n) {
        out |= ((vs(i) >>> j) & 1L) << (j * n + i)
        i += 1
      }
      j += 1
    }
    out
  }
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

/** N-ary Morton interleave (3+ clustering columns); null if any input
  * is null. Interpreted eval — the write-side sort this feeds is IO
  * bound, not expression bound. */
case class InterleaveBitsN(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrder.interleaveN(arr)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object ZOrderExpression {
  def interleaveBits(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long"))))

  def interleaveBitsN(cols: Column*): Column = {
    require(cols.length >= 2, "need at least 2 clustering columns")
    if (cols.length == 2) interleaveBits(cols(0), cols(1))
    else ColumnBridge.column(InterleaveBitsN(
      cols.map(c => ColumnBridge.expression(c.cast("long")))))
  }
}
