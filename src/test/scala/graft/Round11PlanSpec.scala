package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan pins for the §2.105–§2.107 batch: column pruning reaches the
  * parquet scans, every window sits over aggregated input (the
  * DistRank exemption contract holds for the whole new surface), the
  * moment-broadcast queries actually broadcast, and the MERGE apply
  * stays at its minimal shuffle budget. */
class Round11PlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => f }

  private def windowsOverRaw(p: SparkPlan): Seq[WindowExec] =
    p.collect {
      case w: WindowExec if w.collectFirst {
        case a: HashAggregateExec => a
      }.isEmpty => w
    }

  test("q_spearman prunes lineitem to its three columns") {
    for (sc <- scans(plan("q_spearman")))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("l_returnflag", "l_quantity", "l_extendedprice"),
        s"over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
  }

  test("new stat queries: every window runs over aggregated input") {
    for (name <- Seq("q_spearman", "q_wilcoxon_signed", "q_friedman",
      "q_page_hinkley", "q_theil_u", "q_rolling_corr"))
      assert(windowsOverRaw(plan(name)).isEmpty,
        s"$name: a window runs over non-aggregated input")
  }

  test("q_grubbs broadcasts the per-type moments back to the scan") {
    val p = plan("q_grubbs")
    assert(p.collectFirst { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "expected a broadcast join of the 5-row moment table")
    // per-branch pruning: the moment-side scan drops event_id entirely
    val reads = scans(p).map(_.requiredSchema.fieldNames.toSet)
    assert(reads.forall(_.subsetOf(
      Set("event_type", "event_id", "value"))), s"over-read: $reads")
    assert(reads.contains(Set("event_type", "value")),
      "moment scan should drop event_id")
  }

  test("q_merge_upsert: two snapshot shuffles + the presentation sort") {
    val p = plan("q_merge_upsert")
    // two custkey aggregates (one per snapshot); the full-outer join
    // reuses their partitioning; orderedAll adds its repartition(1).
    // AQE may insert nothing else — >4 shuffles is a plan regression.
    val shuffles = p.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 4,
      s"unexpected extra shuffles: ${shuffles.size}")
    for (sc <- scans(p))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority",
          "o_totalprice"))
  }

  test("q_pmi and q_perplexity prune documents to the text columns") {
    for (sc <- scans(plan("q_pmi")))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("lang", "text"),
        s"q_pmi over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
    // per-branch pruning: the vocab-side documents scan drops doc_id
    val reads = scans(plan("q_perplexity"))
      .map(_.requiredSchema.fieldNames.toSet)
    assert(reads.forall(_.subsetOf(Set("lang", "doc_id", "text"))),
      s"q_perplexity over-read: $reads")
    assert(reads.contains(Set("lang", "text")),
      "vocab scan should drop doc_id")
  }

  test("q_partial_corr is one scan, one aggregate, zero joins") {
    val p = plan("q_partial_corr")
    assert(scans(p).size == 1, "expected exactly one lineitem scan")
    assert(p.collectFirst { case b: BroadcastHashJoinExec => b }.isEmpty)
    for (sc <- scans(p))
      assert(sc.requiredSchema.fieldNames.toSet ==
        Set("l_quantity", "l_extendedprice", "l_discount"))
  }
}
