package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator: logical node → strategy →
  * partial/final physical operators (the SURVEY "custom LogicalPlan +
  * SparkStrategy + SparkPlan via extensions" tier, used where composing
  * built-ins can't express the efficient plan).
  *
  * The composable formulation — `row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k` — gets a partial `WindowGroupLimit` from Spark
  * 3.5+'s `InferWindowGroupLimit`, so its shuffle is bounded too. What
  * the window plan still pays is SORTING: a full O(n log n) sort of
  * every input partition before the partial limit, and a second sort
  * reduce-side (`GroupedTopKSpec` measures both plans: equal bounded
  * shuffle records, two Sort nodes vs zero). This operator runs the
  * aggregation-style two-phase shape with bounded HEAPS instead: the
  * PARTIAL pass keeps the k best rows per key per input partition
  * (memory O(keys·k) per task, O(n log k) heap updates, no sort), the
  * exchange carries at most k·partitions rows per key, and the FINAL
  * pass merges heaps per key. Same exactly-once result (ties broken by
  * the caller's total order), no sort anywhere.
  *
  * Physical mechanics mirror HashAggregate partial/final: the final
  * node's `requiredChildDistribution = ClusteredDistribution(keys)` lets
  * EnsureRequirements insert the exchange; the partial node accepts any
  * distribution. Heaps hold UnsafeRow copies keyed by the grouping
  * projection; eviction compares with the caller's SortOrder via
  * `RowOrdering` codegen.
  */
object GroupedTopK {

  /** Public API: the k first rows of each key-group under `order`
    * (which must be a TOTAL order — include a unique tie-break column —
    * for a deterministic result).
    */
  def topK(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[GroupedTopKStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new GroupedTopKStrategy
    val sortOrders = order.map { c =>
      org.apache.spark.sql.graft.shims.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    org.apache.spark.sql.graft.shims.ofRows(
      spark,
      GroupedTopKNode(
        keyCols.map(UnresolvedAttribute(_)),
        sortOrders,
        k,
        df.queryExecution.analyzed
      )
    )
  }
}

/** Logical node: output = child output; expressions resolve through the
  * standard analyzer passes like any built-in unary node.
  */
case class GroupedTopKNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final.
  */
class GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(keys, order, k, child) =>
      val partial = GroupedTopKExec(keys, order, k, partial = true, planLater(child))
      GroupedTopKExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class GroupedTopKExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // max-heap under the sort order: head = worst retained row — the
      // eviction candidate when a better row arrives at capacity
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.on[UnsafeRow](r => r: InternalRow)
            )
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}
