package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

/** Round-11 item 1: the value-histogram window class joins the DistRank
  * gate. Two global-histogram members (q_median_test, q_kruskal_wallis —
  * [[ops.DistRank.withPrefixSum]]) and three partitioned-histogram
  * members whose partition axis has tiny cardinality (q_weighted_quantile
  * on 3 return flags, q_weighted_median / q_percentile_disc on 5 types /
  * priorities — the new [[ops.DistRank.withPrefixSumBy]]). For each, the
  * conf-forced parallel path must be BIT-EQUAL to the serial plan, the
  * auto ladder must engage to the same rows, and the gated physical plan
  * must contain no window (partitioned or not) whose input is
  * non-aggregated fact data. B = 7: odd bucket count, seams exercised. */
class Round11RankSpec extends SparkSpec {

  private val gated = Seq("q_median_test", "q_kruskal_wallis",
    "q_weighted_quantile", "q_weighted_median", "q_percentile_disc")

  private def rows(name: String): Set[String] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toSeq.mkString("|")).toSet

  for (name <- gated) {
    test(s"$name: rankBuckets path is bit-equal to the serial plan") {
      val serial = rows(name)
      spark.conf.set("spark.graft.rankBuckets", "7")
      try {
        val parallel = rows(name)
        assert(parallel == serial,
          s"gated $name diverged: ${parallel.diff(serial).take(3)} vs " +
            s"${serial.diff(parallel).take(3)}")
      } finally spark.conf.unset("spark.graft.rankBuckets")
    }

    test(s"$name: auto-engaged path is bit-equal to the serial plan") {
      val serial = rows(name)
      spark.conf.set("spark.graft.rankAutoProbeBytes", "0")
      spark.conf.set("spark.graft.rankAutoCrossoverRows", "1")
      spark.conf.set("spark.graft.rankAutoBuckets", "7")
      try {
        val auto = rows(name)
        assert(auto == serial,
          s"auto-gated $name diverged: ${auto.diff(serial).take(3)} vs " +
            s"${serial.diff(auto).take(3)}")
      } finally {
        spark.conf.unset("spark.graft.rankAutoProbeBytes")
        spark.conf.unset("spark.graft.rankAutoCrossoverRows")
        spark.conf.unset("spark.graft.rankAutoBuckets")
      }
    }

    test(s"$name: gated plan has no window over non-aggregated input") {
      spark.conf.set("spark.graft.rankBuckets", "7")
      try {
        val p = SparkEntry.queries(name)(spark, sf)
          .queryExecution.sparkPlan
        // The gate's residual windows are the bucket-offset prefix sums
        // (input: a groups×B aggregate) and the within-bucket sums
        // (input: the pinned HISTOGRAM — itself an aggregate, or an RDD
        // scan of the pinned aggregate). Assert every WindowExec child
        // subtree contains an aggregate or reads a pinned (checkpointed)
        // frame — never a raw parquet fact scan.
        val winOverScan = p.collect {
          case w: WindowExec
            if w.collectFirst { case a: HashAggregateExec => a }.isEmpty &&
              !w.child.toString.contains("Scan ExistingRDD") => w
        }
        assert(winOverScan.isEmpty,
          s"$name: a window runs over non-aggregated, non-pinned input:" +
            s"\n${winOverScan.mkString("\n")}")
      } finally spark.conf.unset("spark.graft.rankBuckets")
    }
  }

  test("withPrefixSumBy stitches per-group exclusive sums exactly") {
    // synthetic many-buckets-per-group fixture: 2 groups × 1000 distinct
    // keys, value = key % 7 + 1; compare against the serial per-group
    // window at several bucket counts including degenerate B = 1.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 2000).map(i =>
      (if (i % 2 == 0) "a" else "b", (i / 2).toLong * 3 + 1,
        (i % 7 + 1).toLong)).toDF("g", "k", "v")
    val serial = df.withColumn("ps", coalesce(sum("v").over(
        Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(_.toSeq.mkString("|")).toSet
    for (b <- Seq(1, 7, 64)) {
      val got = ops.DistRank.withPrefixSumBy(df, Seq("g"), col("k"), col("k"),
          col("v"), b, "ps")
        .select("g", "k", "v", "ps")
        .collect().map(_.toSeq.mkString("|")).toSet
      assert(got == serial, s"B=$b diverged: ${got.diff(serial).take(3)}")
    }
  }
}
