package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst aggregate: largest-k values per group, descending.
  *
  * The extension-ladder rung between a scalar `Expression` and a full
  * custom operator: a `TypedImperativeAggregate` participates in
  * Spark's partial+final aggregation like any built-in — each map task
  * keeps a bounded k-element min-heap per group, the shuffle carries
  * serialized heaps (≤ k doubles each, NEVER the group's rows), and
  * merge is heap-union. The same bounded-state combine contract the
  * reference's map-side merge applies to shuffle data (reference
  * src/Merger/MergeManager.cc map-side merge); contrast with the typed
  * `Aggregator` exemplar (`graft_wavg`, JVM-object buffer) and the
  * whole-operator `GroupTopK` (full-row top-k).
  *
  * Ties are value-ties only (the buffer holds bare doubles), so the
  * output multiset is deterministic and SQL-oracle-checkable.
  */
@ExpressionDescription(
  usage = "graft_topk_vals(expr, k) - largest k values of expr, descending.")
case class TopKValuesAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  // input must already be DoubleType (callers cast; AbstractDataType /
  // ImplicitCastInputTypes are private[sql] in Spark 4)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_vals"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1) // min-heap

  private def offer(buf: java.util.PriorityQueue[java.lang.Double],
                    v: Double): Unit = {
    if (buf.size < k) buf.add(v)
    else if (v > buf.peek()) { buf.poll(); buf.add(v) }
  }

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[java.lang.Double],
                     b2: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValuesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValuesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
