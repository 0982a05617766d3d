package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword ratio over non-empty whitespace tokens, one pass.
  *
  * Bit-exact mirror of the HOF form (`TextFunctions.stopwordRatioHof`):
  * `when(size(toks) > 0, size(filter(toks, isin(stopwords))) /
  * size(toks)).otherwise(0.0)` — the same Int counts through the same
  * double division. Language-ID calls this twice per row (once rounded
  * for the ratio column, once compared against the threshold), which
  * with the HOF tree meant four full interpreted tokenizations per
  * document.
  */
case class StopwordRatioRaw(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val parts = input.asInstanceOf[UTF8String]
      .split(UTF8String.fromString(" "), -1)
    var i = 0
    var n = 0
    var stop = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.numBytes > 0) {
        n += 1
        if (stopSet.contains(p)) stop += 1
      }
      i += 1
    }
    if (n > 0) stop.toDouble / n.toDouble else 0.0
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StopwordRatioExpression {
  def stopwordRatioRaw(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(StopwordRatioRaw(
      ColumnBridge.expression(text), stopwords))
}
