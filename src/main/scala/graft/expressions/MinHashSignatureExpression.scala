package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

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
  * explode, no aggregation buffers — a map-side column like SimHash64,
  * and (since r16) a whole-stage-codegen participant rather than a
  * CodegenFallback island: the signature projection now fuses into the
  * surrounding scan/filter/project span.
  *
  * Null ELEMENTS mirror the composed fold exactly: `xxhash64(g, i)`
  * skips a null child, leaving the running state at the seed, so a
  * null shingle contributes `hashInt(i, 42L)` to every min — current
  * producers (`WordShingles`) emit containsNull=false arrays, but the
  * expression no longer NPEs if a future caller feeds nullable
  * elements. Returns null for an empty shingle array (callers filter
  * `size(sh) > 0` first, matching the old explode semantics where an
  * empty array produced no rows).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Empty input arrays yield null regardless of child nullability.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhashsignature requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  // The generated code CALLS the shared compiled kernel instead of
  // pasting the hash loop into every generated class: a first codegen
  // attempt inlined the loop and regressed cold CPU ~6x (bench min-of-3
  // q_dedup_minhash CPU 10 -> 65 s) because each per-plan Janino class
  // re-enters the JVM interpreter and must re-earn C2 compilation,
  // while the single kernel method below warms once per JVM and stays
  // hot across queries and plans. The expression still participates in
  // whole-stage codegen (no fallback row boxing, no span break) — the
  // span pays one static call per row.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mod = "graft.expressions.MinHashSignature$.MODULE$"
      s"""
         |${ev.value} = $mod.compute($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** The shared hash kernel: one string hash + k seed hashes per
    * element, element-wise min. Returns null for an empty array (the
    * explode semantics callers rely on). Called from both interpreted
    * eval and generated code — keep it a single hot method. */
  def compute(arr: ArrayData, k: Int): UnsafeArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var e = 0
    while (e < n) {
      val base =
        if (arr.isNullAt(e)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(e), 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

object MinHashSignatureExpression {
  def minhashSignature(shingles: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), k))
}
