package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrounded composite quality score in ONE pass over the string.
  *
  * Bit-exact mirror of the HOF formulation
  * (`TextFunctions.qualityScoreHof`, kept as the differential twin):
  * tokens = split on single spaces dropping empties; then
  *
  *   0.3 * (distinctTokens / tokens)            (0.0 for empty docs)
  * + 0.3 * min(1.0, nChars / 500.0)
  * + 0.4 * min(1.0, (sumTokenChars / tokens) / 8.0)   (0.0 for empty)
  *
  * with the same IEEE operand order and the same Int accumulator for
  * the char sum the HOF `aggregate(..., 0, +)` uses. The caller wraps
  * the result in Spark's own `round(_, 3)` so rounding semantics are
  * the builtin's, identical to the HOF path and to the DuckDB oracle.
  *
  * Why native: the HOF tree is five nested interpreted lambdas that
  * Catalyst re-evaluates once per consumer branch (and once more inside
  * a pushed-down IsNotNull filter); this is the same collapse applied to
  * shingles/SimHash/SRP (reference analog: UDA's tight C++ inner loops
  * over opaque bytes, e.g. src/Merger/MergeQueue.h:126-270).
  */
case class QualityScoreRaw(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(text: Any, nChars: Any): Any = {
    val parts = text.asInstanceOf[UTF8String]
      .split(UTF8String.fromString(" "), -1)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    var n = 0
    var sumChars = 0 // Int on purpose: mirrors the HOF's Int accumulator
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes > 0) {
        n += 1
        sumChars += p.numChars()
        seen.add(p)
      }
      i += 1
    }
    val ncD = nChars match {
      case l: java.lang.Long    => l.toDouble
      case v: java.lang.Integer => v.toDouble
      case d: java.lang.Double  => d.doubleValue()
      case s: java.lang.Short   => s.toDouble
    }
    val distinctRatio =
      if (n > 0) seen.size.toDouble / n.toDouble else 0.0
    val lenScore = math.min(1.0, ncD / 500.0)
    val tokScore = math.min(1.0,
      if (n > 0) (sumChars.toDouble / n.toDouble) / 8.0 else 0.0)
    0.3 * distinctRatio + 0.3 * lenScore + 0.4 * tokScore
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QualityScoreExpression {
  def qualityScoreRaw(text: Column, nChars: Column): Column =
    ColumnBridge.column(QualityScoreRaw(
      ColumnBridge.expression(text), ColumnBridge.expression(nChars)))
}
