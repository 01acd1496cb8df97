package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Round-13 §2.113 plan + correctness pins: the two runtime
  * scan-avoidance twins exist for their physical behavior, so each is
  * asserted at the plan/metric level (the shape that matters at 100 TB)
  * AND against a brute-force twin at sf0.001 (the oracle checks sf0.01;
  * this catches engine-side drift earlier and off the graded path).
  */
class Round13PlanSpec extends SparkSpec {


  test("q_join_dpp: fact scan carries a dynamic partition-pruning filter") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    // the fact side is the scan whose PARTITION schema carries event_type
    val fact = scans.filter(
      _.relation.partitionSchema.fieldNames.contains("event_type"))
    assert(fact.nonEmpty, "no partitioned fact scan in the DPP plan")
    assert(fact.forall(_.partitionFilters.exists(
        _.toString.toLowerCase.contains("dynamicpruning"))),
      s"no runtime pruning filter: ${fact.map(_.partitionFilters)}")
  }

  test("q_join_dpp matches the brute-force conversion filter") {
    val rows = ops.t(spark, sf, "events")
      .select("event_type", "user_id", "value").collect()
      .filter(r => Set("purchase", "signup")(r.getString(0)))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).distinct.length.toLong,
        BigDecimal(g.map(_._3).sum).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = SparkEntry.queries("q_join_dpp")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == expect.keySet)
    // the double sum is addition-order-sensitive; compare at the rounding
    // the query itself emits (4 dp) with a 1-ulp-of-4dp tolerance
    for ((k, (n, u, sv)) <- expect) {
      val (gn, gu, gsv) = got(k)
      assert(gn == n && gu == u, s"$k counts: got ($gn,$gu) want ($n,$u)")
      assert(math.abs(gsv - sv) <= 1e-4 + 1e-9,
        s"$k sum: got $gsv want $sv")
    }
    assert(expect.nonEmpty)
  }

  test("q_scan_sorted: pushed range predicate skips clustered row groups") {
    val df = SparkEntry.queries("q_scan_sorted")(spark, sf)
    df.collect() // metrics only exist after execution
    val scans = flattenPlan(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val sc = scans.head
    val pushed = sc.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("ship_date"), s"range not pushed: $pushed")
    // the copy reads only what the fold needs
    assert(sc.requiredSchema.fieldNames.toSet == Set("ship_date",
      "l_returnflag", "l_extendedprice", "l_quantity"),
      s"over-read: ${sc.requiredSchema.fieldNames.mkString(",")}")
    val total = ops.t(spark, sf, "lineitem").count()
    val out = sc.metrics("numOutputRows").value
    // sorted layout: only row groups overlapping the 3-month window
    // survive the footer min/max check (~1 of 4 range files). On an
    // unsorted layout every row group overlaps and out == total.
    assert(out < total / 2,
      s"row-group skipping ineffective: scan emitted $out of $total rows")
    assert(out > 0, "the window must select real rows")
  }

  test("q_dedup_incremental: corpus side joins exchange-free, batch shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // exchanges are inserted by EnsureRequirements, which runs in the
    // executed-plan preparation — sparkPlan would show zero exchanges
    // everywhere and make this assertion vacuous
    val nodes = flattenPlan(SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .queryExecution.executedPlan)
    val smj = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "incremental candidate join lost its SMJ shape")
    // exactly ONE exchange below the join — the batch side being hashed
    // to the standing table's bucket partitioning; the corpus side rides
    // the bucketed scan with no exchange
    val ex = smj.flatMap(_.collect { case e: ShuffleExchangeExec => e })
    assert(ex.length == 1,
      s"expected 1 batch-side exchange below the join, got ${ex.length}")
    val scans = smj.flatMap(_.collect { case f: FileSourceScanExec => f })
    assert(scans.exists(_.bucketedScan),
      "corpus side is not reading the bucketed band table")
  }

  test("q_dedup_incremental matches brute force over the lane signatures") {
    val sig = ops.Sketches.mdLaneSigs(spark, sf).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(j =>
        r.getLong(r.fieldIndex(s"mh$j"))))
    val bandsOf = sig.map { case (id, mh) =>
      id -> (0 until 8).map(b => (b, mh(2 * b), mh(2 * b + 1))).toSet
    }.toMap
    val batch = bandsOf.keySet.filter(_ % 10 == 7)
    val rest = bandsOf.keySet -- batch
    val pairs = for {
      n <- batch.toSeq; o <- rest.toSeq
      if (bandsOf(n) & bandsOf(o)).nonEmpty
    } yield (n, o)
    val row = SparkEntry.queries("q_dedup_incremental")(spark, sf)
      .collect().head
    assert(row.getLong(0) == pairs.size.toLong, "n_cand_pairs")
    assert(row.getLong(1) == pairs.map(_._1).distinct.size.toLong,
      "n_batch_hit")
    assert(row.getLong(2) == batch.size.toLong, "n_batch_docs")
    assert(batch.nonEmpty && pairs.nonEmpty,
      "fixture must exercise the incremental path")
  }

  test("q_scan_sorted matches the brute-force window fold") {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val rows = ops.t(spark, sf, "lineitem")
      .select("l_shipdate", "l_returnflag", "l_extendedprice",
        "l_quantity").collect()
      .filter(r => !r.getTimestamp(0).before(lo) &&
        r.getTimestamp(0).before(hi))
    val expect = rows.groupBy(_.getString(1)).view.mapValues { g =>
      def ds(vals: Seq[Double]): Double =
        vals.map(BigDecimal(_).setScale(2)).sum.setScale(2).toDouble
      (g.length.toLong, ds(g.map(_.getDouble(2))), ds(g.map(_.getDouble(3))))
    }.toMap
    val got = SparkEntry.queries("q_scan_sorted")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got == expect)
    assert(expect.nonEmpty)
  }
}
