package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All `k` MinHash values of a shingle set in ONE pass — bit-identical
  * to the `min(xxhash64(g, i))`-per-i aggregate it replaces, at a
  * fraction of the cost.
  *
  * The composed form explodes every (doc, shingle) row through the
  * aggregate machinery and evaluates `xxhash64(g, lit(i))` for each of
  * the k seeds — which RE-HASHES THE SHINGLE STRING k times, because
  * Spark's multi-arg xxhash64 is a fold (h = hash(g, 42); hash(i, h)).
  * At 64 hashes × ~12M shingle rows (sf0.1) that is ~770M string
  * hashes per pair-table build, the single largest CPU sink in the
  * dedup family (r15 profile: q_dedup_minhash ~30 CPU-s, of which the
  * signature stage is the bulk).
  *
  * Here the string is hashed ONCE per shingle (the same
  * `XxHash64Function.hash(_, StringType, 42L)` Spark's own expression
  * applies), and the k per-seed values reuse that 8-byte state via
  * `hashInt(i, base)` — exactly the tail step of the fold, so every
  * m_i equals the composed form bit-for-bit (MinHashSignatureSpec pins
  * the equivalence). One string hash + k long hashes per shingle, no
  * explode, no aggregation buffers — a map-side column like SimHash64.
  *
  * Returns null for an empty shingle array (callers filter
  * `size(sh) > 0` first, matching the old explode semantics where an
  * empty array produced no rows).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var e = 0
    while (e < n) {
      val g = arr.getUTF8String(e)
      val base = XXH64.hashUTF8String(g, 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignatureExpression {
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), k))
}
