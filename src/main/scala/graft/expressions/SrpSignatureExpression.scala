package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Signed-random-projection signature: bit j of the result is the sign
  * of ⟨vec, plane_j⟩ for `bits` fixed pseudo-random Gaussian hyperplanes
  * (deterministic from `seed` — java.util.Random is seed-stable).
  *
  * Deliberately `CodegenFallback`: the first formulation (64 DotProduct
  * sub-expressions over 64-element literal arrays) embedded ~4096 double
  * literals into the generated Java source; Janino compilation of the
  * resulting megabyte class burned minutes of CPU per plan. Here the
  * plane matrix lives in the expression object and eval is one tight
  * dim×bits loop — no generated source at all.
  */
case class SrpSignature(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var j = 0
    while (j < bits) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * p(i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SrpSignatureExpression {
  def srpSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SrpSignature(ColumnBridge.expression(vec), dim, bits, seed))
}
