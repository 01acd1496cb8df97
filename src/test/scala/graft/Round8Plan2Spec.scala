package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan pins for the round-8 §2.56–§2.64 surface — the
  * PLANS.md claims, asserted on the pre-AQE sparkPlan. */
class Round8Plan2Spec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  /** Only unconditioned broadcast crosses (the grand-total idiom) —
    * a predicate-bearing BNLJ is a degenerated equi-join. */
  private def noNlj(name: String): Unit =
    for (j <- plan(name).collect {
        case j: BroadcastNestedLoopJoinExec => j })
      assert(j.condition.isEmpty,
        s"$name plans a conditioned all-pairs NLJ: ${j.joinType}")

  test("§2.56 info-theory grids never shuffle a cartesian") {
    for (q <- Seq("q_simpson", "q_jsd_sources", "q_mutual_info"))
      noNlj(q)
  }

  test("q_jsd_sources broadcasts the source catalog, not the vocab") {
    // the grid build is ct (vocab-sized, stays partitioned) cross
    // broadcast(ns) — every BHJ/cross build side must be an aggregate
    // over sources/totals, never the token axis
    val p = plan("q_jsd_sources")
    assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }
      .forall(_.condition.isEmpty))
    // and the per-token left join back to sc is a KEYED equi-join
    // (broadcast at fixture stats, shuffled at scale — never an NLJ)
    assert(p.collect { case j: BaseJoinExec
        if j.leftKeys.nonEmpty => j }.nonEmpty,
      "the sc left-join lost its equi keys")
  }

  test("§2.57 agreement audits are scan-shaped (no fact-fact joins)") {
    for (q <- Seq("q_cohens_kappa", "q_mcc")) {
      val p = plan(q)
      assert(p.collect { case j: BaseJoinExec => j }.isEmpty,
        s"$q should be a pure conditional-aggregate scan")
    }
    // f1_class joins only ≤10-row margin aggregates
    noNlj("q_f1_class")
  }

  test("§2.58 concentration folds collapse facts before windows") {
    for (q <- Seq("q_lorenz", "q_hhi", "q_crk_share")) noNlj(q)
    // every window input is an aggregate (decile cum / brand rank)
    for (q <- Seq("q_lorenz", "q_crk_share");
         w <- plan(q).collect { case w: WindowExec => w })
      assert(w.collectFirst {
        case a if a.nodeName.contains("HashAggregate") => a
      }.nonEmpty, s"$q window input is not aggregated")
  }

  test("q_crk_share broadcasts all dims (Q5 shape)") {
    assert(plan("q_crk_share").collect {
      case j: BroadcastHashJoinExec => j }.size >= 3,
      "nation/region/part dims should all broadcast")
  }

  test("§2.59 spread diagnostics: windows over histograms only") {
    for (q <- Seq("q_anova", "q_tukey_fences", "q_bowley_skew")) noNlj(q)
    for (q <- Seq("q_tukey_fences", "q_bowley_skew");
         w <- plan(q).collect { case w: WindowExec => w })
      assert(w.collectFirst {
        case a if a.nodeName.contains("HashAggregate") => a
      }.nonEmpty, s"$q window input is not aggregated")
  }

  test("§2.60 profiles are aggregate-only plans") {
    for (q <- Seq("q_dup_profile", "q_embed_variance", "q_order_profile"))
      noNlj(q)
    assert(plan("q_embed_variance").collect {
      case j: BaseJoinExec => j }.isEmpty,
      "embed variance is one posexplode + aggregate, no join")
  }

  test("§2.61 shift audits never NLJ and bin before margins") {
    for (q <- Seq("q_psi", "q_bhattacharyya", "q_tail_ratio")) noNlj(q)
  }

  test("§2.62 sessionizers window on the user axis") {
    for (q <- Seq("q_session_depth", "q_bounce_rate")) {
      noNlj(q)
      val ws = plan(q).collect { case w: WindowExec => w }
      assert(ws.nonEmpty)
      // the sessionizer windows partition by user_id — never global
      for (w <- ws)
        assert(w.partitionSpec.nonEmpty,
          s"$q has an unpartitioned (single-partition) window")
    }
  }

  test("§2.63 commerce plans collapse before percentile windows") {
    for (q <- Seq("q_discount_lift", "q_interpurchase", "q_dow_profile"))
      noNlj(q)
    assert(plan("q_discount_lift").collect {
      case j: BaseJoinExec => j }.isEmpty,
      "discount lift is a pure scan aggregate")
  }

  test("§2.64 embed audits: in-row expansion, no self-join") {
    for (q <- Seq("q_centroid_shift", "q_pq_distortion", "q_dim_corr"))
      noNlj(q)
    // the pair expansion must NOT be a join of embeddings with itself:
    // at most broadcast/margin joins appear
    assert(plan("q_dim_corr").collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j }.isEmpty,
      "dim_corr should expand pairs in-row, not via a shuffled self-join")
    assert(plan("q_pq_distortion").collect {
      case j: BaseJoinExec => j }.isEmpty)
  }

  test("scan-shaped audits shuffle only to aggregate") {
    // pure profile queries: every shuffle below the final ordering is
    // an aggregate or window exchange, never a join shuffle
    for (q <- Seq("q_mcc", "q_pq_distortion", "q_embed_variance")) {
      val shuffles = plan(q).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty) // at least the orderedAll repartition
    }
  }
}
