package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Group-wise top-k as a first-class operator: logical node → strategy
  * → physical exec, the full custom-operator extension ladder (the
  * rung below expressions/generators).
  *
  * WHY an operator instead of `row_number().over(window) <= k`: the
  * window formulation sorts EVERY group's full row set (partition-wide
  * sort after the exchange) to discard all but k rows. This exec keeps
  * a bounded k-row heap per group — O(n log k) with O(groups·k) memory,
  * no sort buffer, no spill pressure — and runs twice: a partial pass
  * before the exchange (each map task emits ≤ k rows per group, the
  * combiner pattern the reference applies to shuffle data, reference
  * src/Merger/MergeManager.cc map-side merge) and a final pass after
  * it. At 100 TB the partial pass is the difference between shuffling
  * every row and shuffling ≤ k·maps rows per group.
  *
  * Row-number semantics (ties broken by heap arrival) — pass a
  * tie-breaking column in `order` for fully deterministic output, same
  * as you would for `row_number`.
  */
case class GroupTopKNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      // ascending interpretation of the SortOrder list: "top" = the k
      // FIRST rows under `order` (use .desc for largest-first)
      val ord = RowOrdering.create(o, childOutput)
      val heaps = collection.mutable.LinkedHashMap[UnsafeRow,
        collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          collection.mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

/** Plans GroupTopKNode as partial → (exchange via EnsureRequirements)
  * → final. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, o, k, child) =>
      GroupTopKExec(g, o, k, partial = false,
        GroupTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API; registers the strategy on first use (the
  * session-build path is `graft.GraftSessionExtensions`). */
object GroupTopK {
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    val node = GroupTopKNode(
      groupCols.map(PlanBridge.expression),
      order.map(PlanBridge.sortOrder), k, PlanBridge.analyzed(df))
    PlanBridge.ofRows(spark, node)
  }
}
