package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** AQE-interplay pins (round-9 item 6): PlanSpec asserts the pre-AQE
  * sparkPlan; this suite asserts the load-bearing shapes SURVIVE in the
  * FINAL adaptive plan with `spark.sql.adaptive.enabled=true` explicitly
  * set — the 100 TB deployment default, where AQE re-plans at runtime and
  * could in principle demote a shape the static plan promised (e.g.
  * re-introduce an exchange under a bucketed join, or drop a broadcast).
  * Each query is EXECUTED (AQE only finalizes plans at runtime) and the
  * adaptive plan is flattened through query-stage leaves, which hide
  * their subplans from the default TreeNode collect. */
class AqePlanSpec extends SparkSpec {


  private def finalPlan(name: String): Seq[SparkPlan] = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      // materialize THIS queryExecution (df.count() would build and run
      // a different plan, leaving this one un-finalized)
      df.queryExecution.toRdd.count()
      flattenPlan(df.queryExecution.executedPlan)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("q_join_bucketed: exchange-free join survives AQE") {
    val nodes = finalPlan("q_join_bucketed")
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "bucketed join lost its sort-merge shape under AQE")
    // no shuffle anywhere below the join — the bucketed co-location
    // contract; the only exchange in the whole plan is orderedAll's
    // final 1-partition presentation repartition ABOVE the aggregate
    val below = smj.flatMap(flattenPlan(_).drop(1)).collect {
      case e: ShuffleExchangeExec => e
    }
    assert(below.isEmpty, s"AQE re-introduced a shuffle: $below")
  }

  test("q_join_broadcast: dimension broadcast survives AQE") {
    assert(finalPlan("q_join_broadcast").exists {
      case _: BroadcastHashJoinExec => true
      case _ => false
    }, "broadcast dim join demoted under AQE")
  }

  test("q_join_salted: salt stays in the join key under AQE") {
    val joins = finalPlan("q_join_salted").collect {
      case j: BroadcastHashJoinExec => (j.leftKeys, j.rightKeys)
      case j: SortMergeJoinExec => (j.leftKeys, j.rightKeys)
      case j: ShuffledHashJoinExec => (j.leftKeys, j.rightKeys)
    }
    assert(joins.nonEmpty, "salted join planned no equi-join")
    assert(joins.exists { case (l, r) =>
      l.exists(_.toString.contains("salt")) &&
        r.exists(_.toString.contains("salt"))
    }, s"salt dropped from join keys: $joins")
  }

  test("q_source_partitioned: directory pruning survives AQE") {
    val scans = finalPlan("q_source_partitioned").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(
      _.toString.contains("event_type"))),
      "partition filter lost under AQE")
  }

  test("AQE skew-join splits a skewed partition (the 100 TB salting peer)") {
    // Mechanism pin: the engine's runtime skew mitigation must actually
    // engage when a join key is pathologically hot — the adaptive
    // complement to q_join_salted's static salting. Micro-frame (not a
    // fixture): 180k rows on ONE key vs 20k spread, thresholds lowered
    // so the skew detector can trip at test scale.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // BOTH broadcast knobs: AQE's runtime demotion reads its own
      // adaptive threshold, not just the static planner's
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, when, lit}
      val fact = spark.range(200000L).toDF("id")
        .withColumn("k", when(col("id") < 180000L, 0L).otherwise(col("id")))
      val dim = spark.range(1000L).toDF("k")
        .withColumn("v", col("k") * 2)
      val joined = fact.join(dim, "k")
      // only k = 0 lands in the dim range (the tail keys are ≥ 180000);
      // execute joined's OWN queryExecution so AQE finalizes it
      assert(joined.queryExecution.toRdd.count() == 180000L)
      val skewed = flattenPlan(joined.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
        case j: ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty,
        "AQE did not engage skew-join handling on a 90%-hot key")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_filter_pred: parquet pushdown survives AQE") {
    val scans = finalPlan("q_filter_pred").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed under AQE: $pushed")
  }
}
