package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Round-14 plan pins. q_spearman: the r12 verdict flagged a sf0.1
  * steady-state move (1.9 → 2.7 s) and asked for an explain-diff
  * against the r11 binary; round 14 recorded it (BASELINE.md): the
  * formatted physical plan at sf0.1 is BYTE-IDENTICAL (288 lines,
  * empty diff) between the r11 binary (34a3bcf worktree build) and the
  * current one, and same-session A/B timing is equal-or-faster. The
  * move was box-level. This suite pins the adjudicated plan's two
  * load-bearing properties so a REAL plan shift can never again hide
  * behind box noise: the midrank cum-sums ship as exactly two serial
  * per-flag windows (the DistRank auto-probe stays below its floor at
  * graded SFs — flipping to the at-scale prefix-sum path would change
  * the count), and every parquet scan reads the lineitem fixture (a
  * checkpoint/slot scan appearing here would mean the gate engaged). */
class Round14PlanSpec extends SparkSpec {

  test("q_spearman plan: two serial midrank windows, cells-pin scans") {
    val df = SparkEntry.queries("q_spearman")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 2,
      s"expected the 2 serial per-flag midrank windows, got " +
        s"${windows.size} — the DistRank gate flipped or the shape drifted")
    // r16: `cells` is pinned once (it has three consumers), so the
    // plan's scans read the pin (ExistingRDD under localCheckpoint, or
    // the spearman_cells slot under reliable checkpointing) instead of
    // re-scanning lineitem per consumer. Any OTHER file scan appearing
    // here would mean the shape drifted.
    val offPin = plan.collect { case f: FileSourceScanExec => f }
      .filterNot { f =>
        val p = f.relation.location.rootPaths.mkString(",")
        p.contains("lineitem") || p.contains("spearman_cells")
      }
    assert(offPin.isEmpty,
      s"unexpected scan in the q_spearman plan: " +
        s"${offPin.map(_.relation.location.rootPaths.mkString(","))}")
  }

  test("q_shuffle_coalesce: AQE merges tiny reducer slices at runtime") {
    import org.apache.spark.sql.execution.CoalescedPartitionSpec
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    val df = SparkEntry.queries("q_shuffle_coalesce")(spark, sf)
    df.collect() // AQE re-plans during execution
    val reads = flattenPlan(df.queryExecution.executedPlan).collect {
      case r: AQEShuffleReadExec => r
    }
    assert(reads.nonEmpty, "no AQE shuffle read in the executed plan")
    val static = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(static > 1, "static partition count must exceed 1 for the test")
    // the mechanism under test: at least one read serves FEWER partitions
    // than the static count, with at least one spec spanning multiple
    // reducer indices (a genuine merge, not a passthrough)
    assert(reads.exists(r => r.partitionSpecs.size < static &&
        r.partitionSpecs.exists {
          case c: CoalescedPartitionSpec =>
            c.endReducerIndex - c.startReducerIndex > 1
          case _ => false
        }),
      s"no coalesced shuffle read below $static partitions: " +
        reads.map(_.partitionSpecs.size).mkString(","))
  }

  test("q_join_runtime_filter: Bloom filter injected under cluster thresholds") {
    // the engagement thresholds are cluster-shaped (10 GB application
    // side), so prove the mechanism under lowered ones — the q_join_skew
    // pattern: a session where the fixture LOOKS like a cluster workload
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter." +
      "applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = SparkEntry.queries("q_join_runtime_filter")(s2, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      "no injected Bloom filter (might_contain) in the optimized plan " +
        "under lowered thresholds")
    // the filter must be planted on the FACT (lineitem) side's scan
    // subtree, and results must be identical with the rule disabled
    val got = df.collect().map(_.toSeq).toSet
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val off = SparkEntry.queries("q_join_runtime_filter")(s3, sf)
    assert(!off.queryExecution.optimizedPlan.toString
      .contains("might_contain"))
    assert(off.collect().map(_.toSeq).toSet == got)
    assert(got.nonEmpty)
  }

  test("q_join_runtime_bcast: AQE promotes SMJ to broadcast at runtime") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
      SortMergeJoinExec}
    // the 100 TB shape: static planning would never broadcast (threshold
    // -1), but the adaptive threshold sees the dim stage's ACTUAL output
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    val df = SparkEntry.queries("q_join_runtime_bcast")(s2, sf)
    val got = df.collect().map(_.toSeq).toSet
    val bhj = flattenPlan(df.queryExecution.executedPlan).collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty,
      "no BroadcastHashJoin in the executed plan — with static broadcast " +
        "disabled, only the AQE runtime re-plan could introduce one")
    // control: adaptive promotion also disabled → SMJ end-to-end,
    // identical results (the strategy is physical only)
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s3.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val off = SparkEntry.queries("q_join_runtime_bcast")(s3, sf)
    val offGot = off.collect().map(_.toSeq).toSet
    val smj = flattenPlan(off.queryExecution.executedPlan).collect {
      case j: SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, "control run should keep the sort-merge join")
    assert(flattenPlan(off.queryExecution.executedPlan).collect {
      case j: BroadcastHashJoinExec => j
    }.isEmpty)
    assert(offGot == got)
    assert(got.nonEmpty)
  }
}
