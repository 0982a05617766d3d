package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The `nProbe` nearest centroids (by cosine, descending; index
  * tie-break ascending) of a vector — the cell-assignment /
  * probe-selection primitive for IVF ANN search.
  *
  * The centroid matrix lives in the expression object, NOT in the
  * expression tree: embedding it as per-centroid literal-array
  * sub-expressions would push centroids×dim double literals into
  * generated Java (the Janino meltdown measured for [[SrpSignature]] —
  * see that file). `CodegenFallback` with one tight loop is faster to
  * plan and at least as fast to run.
  */
case class TopCentroids(child: Expression, centroids: Seq[Seq[Double]],
                        nProbe: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val sims = new Array[Double](cents.length)
    var vn = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v.getDouble(j) * cent(j); j += 1 }
      val denom = vn * centNorms(c)
      sims(c) = if (denom == 0.0) 0.0 else dot / denom
      c += 1
    }
    // selection of the top nProbe (nProbe is small; O(nProbe·cells))
    val k = math.min(nProbe, cents.length)
    val picked = new Array[Any](k)
    val used = new Array[Boolean](cents.length)
    var p = 0
    while (p < k) {
      var best = -1
      var c2 = 0
      while (c2 < cents.length) {
        if (!used(c2) && (best < 0 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      used(best) = true
      picked(p) = best
      p += 1
    }
    new GenericArrayData(picked)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TopCentroidsExpression {
  def topCentroids(vec: Column, centroids: Seq[Seq[Double]],
                   nProbe: Int): Column =
    ColumnBridge.column(
      TopCentroids(ColumnBridge.expression(vec), centroids, nProbe))
}
