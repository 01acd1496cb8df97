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
    // local copies: the closure must not capture `this` (which would
    // serialize the whole plan subtree to every task)
    val childOutput = child.output
    val groupL = groupExprs
    val orderL = order
    val tieL = tie
    val kL = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupL, childOutput)
      val orderB = BindReferences.bindReference(orderL, childOutput)
      val tieB = BindReferences.bindReference(tieL, childOutput)
      // head of each queue = the currently WORST kept row (smallest
      // value; among equals, largest tie id) — the eviction candidate.
      // Double.compare is the TOTAL order (NaN greatest, −0.0 < 0.0),
      // matching both Spark's and DuckDB's DESC sort semantics; using it
      // for BOTH the heap and the replacement test keeps the two
      // decisions consistent (primitive ==/> would diverge on NaN/−0.0).
      val evictFirst = new Ordering[(Double, Long, InternalRow)] {
        override def compare(a: (Double, Long, InternalRow),
                             b: (Double, Long, InternalRow)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      val heaps = mutable.HashMap.empty[
        InternalRow, mutable.PriorityQueue[(Double, Long, InternalRow)]]
      while (it.hasNext) {
        val row = it.next()
        val vAny = orderB.eval(row)
        val tAny = tieB.eval(row)
        // fail fast on contract drift: a null silently unboxes to 0.0/0L
        // and would rank mid-pack where both engines rank nulls last
        require(vAny != null && tAny != null,
          "TopKPerGroup requires non-null order and tie values")
        val v = vAny.asInstanceOf[Double]
        val t = tAny.asInstanceOf[Long]
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
        if (q.size < kL) q.enqueue((v, t, row.copy()))
        else {
          val (wv, wt, _) = q.head
          val c = java.lang.Double.compare(v, wv)
          if (c > 0 || (c == 0 && t < wt)) {
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
