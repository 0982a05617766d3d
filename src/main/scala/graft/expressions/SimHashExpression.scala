package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one pass: whitespace-tokenize,
  * de-duplicate tokens, hash each with xxhash64 (seed 42 — identical to
  * Spark's `xxhash64` function), count per-bit ones; bit b of the result
  * is set iff 2·ones(b) > n_distinct_tokens.
  *
  * Composing this from Spark primitives (explode → 16 packed-lane SUMs →
  * 64-term reassembly) was correct but its expression trees cost seconds
  * of driver-side Catalyst analysis per plan (and AQE re-plans multiply
  * that). One opaque expression makes the signature a plain map-side
  * column: no explode, no aggregation, no shuffle, nothing to optimize.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val parts = input.asInstanceOf[UTF8String]
      .split(UTF8String.fromString(" "), -1)
    val seen = new java.util.HashSet[UTF8String]()
    val ones = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.numBytes() > 0 && seen.add(t)) {
        n += 1
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) ones(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHashExpression {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
