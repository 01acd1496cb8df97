package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Plan pins for the §2.99–§2.101 screens: column pruning reaches the
  * parquet scan, Mood's only unpartitioned window sits over an
  * aggregate (the DistRank exemption contract), and the one-fold
  * screens stay one-fold (no stray extra shuffles from the broadcast
  * joins). */
class Round10PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => f }

  test("q_chebyshev_coverage prunes events to (event_type, value)") {
    for (sc <- scans(plan("q_chebyshev_coverage")))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("event_type", "value"),
        s"over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q_cochran_q prunes events to (user_id, ts, event_type)") {
    for (sc <- scans(plan("q_cochran_q")))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("user_id", "ts", "event_type"),
        s"over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q_median_test: the pivot window runs over aggregated input only") {
    val p = plan("q_median_test")
    val globals = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty, "expected the histogram cum window")
    assert(globals.forall(_.collectFirst {
      case a: HashAggregateExec => a
    }.nonEmpty), "unpartitioned window over non-aggregated input")
    // and orders columns prune to the two the test touches — the
    // pivot-side scan even drops the priority (it reads ONE column)
    val reads = scans(p).map(_.requiredSchema.fieldNames.toSet)
    assert(reads.forall(_.subsetOf(
      Set("o_orderpriority", "o_totalprice"))), s"over-read: $reads")
    assert(reads.contains(Set("o_totalprice")),
      "pivot scan should read only o_totalprice")
  }

  test("q_jarque_bera: two passes share one grouping shuffle shape") {
    val p = plan("q_jarque_bera")
    // one shuffle per pass on the same key + orderedAll's presentation
    // repartition(1): anything beyond 3 means a plan regression
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3,
      s"unexpected extra shuffles: ${shuffles.size}")
    for (sc <- scans(p))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("o_orderpriority", "o_totalprice"))
  }

  test("q_mcnemar and q_brier_decomp prune embeddings to (label, embedding)") {
    for (name <- Seq("q_mcnemar", "q_brier_decomp"); sc <- scans(plan(name)))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("label", "embedding"),
        s"$name over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
  }
}
