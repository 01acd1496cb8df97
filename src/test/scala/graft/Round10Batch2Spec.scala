package graft

/** Round-10 §2.96 batch: invariant bounds and brute-force twins on top
  * of the DuckDB oracle — conservation for the sweep-line backlog,
  * JVM-recomputed RBO from first principles, the z² identity against
  * double math, and cross-query consistency between the simhash
  * catch-rate audit and the graded simhash pair list. */
class Round10Batch2Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("rboWeightsE9: exact tail-weight identities") {
    val w = ops.Evaluation.rboWeightsE9
    assert(w.size == 10)
    // strictly decreasing in the max rank (deeper agreement is worth less)
    assert(w.sliding(2).forall(p => p(0) > p(1)))
    // identical full lists sum to 1 − 0.9¹⁰ (e9, per-term rounding)
    assert(w.sum == 651321557L, s"sum = ${w.sum}")
    // the closed forms of the two boundary weights:
    // w_10 = (1−p)·p⁹/10 = 0.0038742048…e9; w_1 − w_2 = (1−p)·p⁰/1 = 0.1e9
    assert(w(9) == 3874205L)
    assert(w(0) - w(1) == 100000000L)
  }

  test("q_rbo: brute-force twin from raw embeddings") {
    val emb = ops.t(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val w = ops.Evaluation.rboWeightsE9
    val expected = emb.filter(_._1 < 50).map { case (pid, pe) =>
      val cands = emb.filter(_._1 != pid)
      def top10(d: Int): Seq[Long] = cands
        .map { case (id, e) => (id, cos(pe, e, d)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
      val (ta, tb) = (top10(64), top10(32))
      val both = ta.filter(tb.contains)
      val rbo = both.map { id =>
        w(math.max(ta.indexOf(id), tb.indexOf(id))) }.sum
      pid -> (both.size.toLong, rbo)
    }.toMap
    val got = run("q_rbo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("q_backlog: deltas conserve and the backlog is never negative") {
    val rows = run("q_backlog").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every order that enters leaves: total delta 0, final backlog 0
    assert(rows.map(_._2).sum == 0L)
    val byDay = rows.sortBy(_._1)
    assert(byDay.last._3 == 0L)
    assert(byDay.forall(_._3 >= 0L), "open_orders >= 0 on every day")
    // the running sum column is consistent with its own deltas
    assert(byDay.map(_._2).scanLeft(0L)(_ + _).drop(1)
      .zip(byDay.map(_._3)).forall(p => p._1 == p._2))
  }

  test("q_ma_cross: brute-force twin over the daily series") {
    import org.apache.spark.sql.functions._
    val daily = ops.t(spark, sf, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (et, rs) =>
      val s = rs.sortBy(_._2).toSeq
      val diffs = s.map { case (_, d, _) =>
        val s7 = s.filter(x => x._2 <= d && x._2 >= d - 6).map(_._3).sum
        val s28 = s.filter(x => x._2 <= d && x._2 >= d - 27).map(_._3).sum
        (d, 4 * s7 - s28)
      }
      diffs.sliding(2).collect {
        case Seq((_, pd), (d, cd))
          if (cd > 0 && pd < 0) || (cd < 0 && pd > 0) =>
          (et, d, if (cd > 0) "golden" else "death", cd, pd)
      }
    }.toSet
    val got = run("q_ma_cross").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_zscore_outliers: the z² identity holds in double math") {
    import org.apache.spark.sql.functions._
    val bal = ops.t(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val moments = bal.groupBy(_._1).map { case (seg, rs) =>
      val n = rs.length.toDouble
      val mean = rs.map(_._3).sum / n
      val varPop = rs.map(r => math.pow(r._3 - mean, 2)).sum / n
      seg -> (mean, varPop)
    }
    val expected = bal.filter { case (seg, _, x) =>
      val (m, v) = moments(seg)
      v > 0 && math.pow(x - m, 2) / v >= 2.25 - 1e-9
    }.map(r => (r._1, r._2)).toSet
    val got = run("q_zscore_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    for (r <- run("q_zscore_outliers").collect())
      assert(r.getLong(3) >= 2250000L, "z2_e6 at or above the 1.5σ bar")
  }

  test("q_simhash_accuracy: caught totals agree with the graded pair list") {
    val acc = run("q_simhash_accuracy").collect()
    assert(acc.nonEmpty)
    for (r <- acc) {
      assert(r.getLong(2) <= r.getLong(1), "n_caught <= n_pairs")
      val bp = r.getLong(3)
      assert(bp >= 0 && bp <= 10000)
      assert(r.getLong(4) <= r.getLong(5), "mean <= max hamming")
    }
    // total caught = |candidate pairs ∩ simhash Hamming<=8 pairs|:
    // the audit and the graded q_dedup_simhash must tell one story
    val sh = run("q_dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = ops.DedupAudit.candPairsForTest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(acc.map(_.getLong(2)).sum == (cand & sh).size.toLong)
  }

  test("q_period_end_balance: brute-force twin") {
    import org.apache.spark.sql.functions._
    val o = ops.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate")).as("us"),
        expr("CAST((year(o_orderdate) - 1990) * 12" +
          " + month(o_orderdate) - 1 AS BIGINT)").as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expected = o.groupBy(r => (r._1, r._4)).toSeq
      .map { case ((_, m), rs) => (m, rs.maxBy(r => (r._3, r._2))._5) }
      .groupBy(_._1).map { case (m, xs) =>
        (m, xs.size.toLong, xs.map(_._2).sum)
      }.toSet
    val got = run("q_period_end_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q_weighted_quantile: cumulative-weight definition, brute-forced") {
    import org.apache.spark.sql.functions._
    val li = ops.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(l_quantity AS BIGINT)").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = li.groupBy(_._1).toSeq.flatMap { case (f, rs) =>
      val grouped = rs.groupBy(_._2).map { case (c, xs) =>
        (c, xs.map(_._3).sum) }.toSeq.sortBy(_._1)
      val tot = grouped.map(_._2).sum
      val cum = grouped.scanLeft(0L)(_ + _._2).drop(1)
      Seq(25L, 50L, 75L, 90L).map { p =>
        val idx = cum.indexWhere(c => c * 100 >= tot * p)
        (f, p, tot, grouped(idx)._1)
      }
    }.toSet
    val got = run("q_weighted_quantile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected)
  }

  test("q_fertility and q_col_profile: structural bounds") {
    for (r <- run("q_fertility").collect()) {
      assert(r.getLong(4) >= r.getLong(3),
        "every nonempty word yields at least one piece")
      if (!r.isNullAt(5)) assert(r.getLong(5) >= 10000L)
    }
    val prof = run("q_col_profile").collect()
    assert(prof.length == 6)
    val n = prof.head.getLong(1)
    for (r <- prof) {
      assert(r.getLong(1) == n, "one n_rows for the whole table")
      assert(r.getLong(2) + r.getLong(3) <= n + r.getLong(2),
        "distinct <= non-null rows")
      assert(r.getString(4) <= r.getString(5) ||
        r.getLong(3) <= 1, "min_v <= max_v lexically for these renders")
    }
  }

  test("q_minmax_scale: bins partition each brand's parts") {
    import org.apache.spark.sql.functions._
    val partCounts = ops.t(spark, sf, "part")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("q_minmax_scale").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val byBrand = rows.groupBy(_._1)
    assert(byBrand.keySet == partCounts.keySet)
    for ((b, rs) <- byBrand) {
      assert(rs.map(_._3).sum == partCounts(b), s"bin counts sum for $b")
      for ((_, bin, _, lo, hi) <- rs) {
        assert(bin >= 0 && bin <= 9)
        assert(lo >= 0 && hi <= 10000 && lo <= hi)
        if (bin < 9) assert(lo >= bin * 1000 && hi < (bin + 1) * 1000)
        else assert(lo >= 9000 && hi <= 10000)
      }
    }
  }
}
