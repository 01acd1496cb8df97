package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan pins for the round-8 §2.40–§2.49 surface — the
  * PLANS.md claims, asserted on the pre-AQE sparkPlan. */
class Round8PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  /** No conditioned nested-loop joins: the only BNLJ these plans may
    * contain is the unconditioned Cross against a broadcast 1-row
    * global aggregate (the grand-total idiom) — a predicate-bearing
    * BNLJ means an equi-join degenerated to all-pairs. */
  private def noNlj(name: String): Unit =
    for (j <- plan(name).collect {
        case j: BroadcastNestedLoopJoinExec => j })
      assert(j.condition.isEmpty,
        s"$name plans a conditioned all-pairs NLJ: ${j.joinType}")

  test("q_tpch_q6 pushes every predicate into the parquet scan") {
    val sc = plan("q_tpch_q6").collect {
      case f: FileSourceScanExec => f }
    assert(sc.nonEmpty)
    val pushed = sc.head.metadata.getOrElse("PushedFilters", "")
    for (c <- Seq("l_shipdate", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed: $pushed")
    // column pruning: only the 4 referenced lineitem columns are read
    assert(sc.head.requiredSchema.fieldNames.toSet ==
      Set("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"))
  }

  test("q_tpch_q19 broadcasts the part dim under the disjunction") {
    val p = plan("q_tpch_q19")
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "part dim not broadcast")
    noNlj("q_tpch_q19")
  }

  test("q_dup_spans posting join stays an equi-join") {
    noNlj("q_dup_spans")
  }

  test("q_graph_modularity label joins stay equi-joins") {
    noNlj("q_graph_modularity")
  }

  test("causal/timeseries collapse queries never NLJ") {
    for (q <- Seq("q_cuped", "q_srm", "q_cramers_v", "q_changepoint",
      "q_seasonal_strength", "q_percentile_disc"))
      noNlj(q)
  }

  test("q_window_locf and q_asof_tolerance are pure window plans") {
    for (q <- Seq("q_window_locf", "q_asof_tolerance")) {
      val p = plan(q)
      assert(p.collect { case j: BaseJoinExec => j }.isEmpty,
        s"$q plans a join — the window spelling regressed")
      assert(p.collect { case w: WindowExec => w }.nonEmpty)
    }
  }

  test("q_percentile_disc windows run over the histogram, not raw rows") {
    // every WindowExec input is downstream of an aggregate: the window
    // sees (priority, cents) histogram rows, never the orders scan
    val p = plan("q_percentile_disc")
    val ws = p.collect { case w: WindowExec => w }
    assert(ws.nonEmpty)
    for (w <- ws)
      assert(w.collectFirst {
        case a if a.nodeName.contains("HashAggregate") => a
      }.nonEmpty, "window input is not aggregated")
  }
}
