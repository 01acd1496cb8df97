package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a CUSTOM whole-operator extension (SURVEY §2.13's
  * deepest tier: logical node + planner strategy + physical operator —
  * the one tier the codegen Expressions / native aggregates / typed
  * Aggregator / optimizer rule ladder did not yet demonstrate).
  *
  * WHY a custom operator: the built-in spelling
  * (`row_number().over(partitionBy(g).orderBy(v.desc)) <= k`) plans a
  * WindowExec, which SORTS every group's full row set — O(n log n) per
  * partition and, at 100 TB, a spill-prone full materialization just to
  * discard all but k rows. This operator keeps a k-BOUNDED HEAP per group
  * (hash-clustered, no sort requirement): O(n log k) time, O(groups·k)
  * memory, nothing spills. Same output contract as the window spelling —
  * rank by (order value DESC, tie id ASC) — so the DuckDB oracle is the
  * standard row_number query.
  *
  * Contract: `order` evaluates to a non-null DOUBLE, `tie` to a unique
  * non-null LONG (the library's standard deterministic tie-break).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its physical operator —
  * injectable via `SparkSessionExtensions.injectPlannerStrategy` or a
  * live session's `experimental.extraStrategies`. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, t, k, child) =>
      TopKPerGroupExec(g, o, t, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask the planner for hash clustering on the group keys — Spark
    * inserts the exchange; we never sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val orderB = BindReferences.bindReference(order, childOutput)
      val tieB = BindReferences.bindReference(tie, childOutput)
      // head of each queue = the currently WORST kept row (smallest
      // value; among equals, largest tie id) — the eviction candidate
      val evictFirst: Ordering[(Double, Long, InternalRow)] =
        Ordering.by { case (v, t, _) => (-v, t) }
      val heaps = mutable.HashMap.empty[
        InternalRow, mutable.PriorityQueue[(Double, Long, InternalRow)]]
      while (it.hasNext) {
        val row = it.next()
        val v = orderB.eval(row).asInstanceOf[Double]
        val t = tieB.eval(row).asInstanceOf[Long]
        // probe with the projection's reused buffer; copy the key only
        // when a new group is first seen
        val probe = keyProj(row)
        val q = heaps.get(probe) match {
          case Some(existing) => existing
          case None =>
            val fresh = mutable.PriorityQueue.empty[
              (Double, Long, InternalRow)](evictFirst)
            heaps.put(probe.copy(), fresh)
            fresh
        }
        if (q.size < k) q.enqueue((v, t, row.copy()))
        else {
          val (wv, wt, _) = q.head
          if (v > wv || (v == wv && t < wt)) {
            q.dequeue(); q.enqueue((v, t, row.copy()))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}
