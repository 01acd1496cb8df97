package graft

/** §2.85 nonparametric batch: brute-force twins at sf0.001 — exact pair
  * counting for Kendall concordance, a sequential runs recount, and
  * direct jackknife arithmetic — plus non-vacuity checks. */
class Round9NonparamSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_kendall matches O(n^2)-free brute force over cells") {
    val rows = ops.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "CAST(round(l_quantity) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (flag, rs) =>
      val cells = rs.groupBy(r => (r._2, r._3)).view
        .mapValues(_.size.toLong).toSeq
      var c = BigInt(0); var d = BigInt(0)
      for (((x1, y1), c1) <- cells; ((x2, y2), c2) <- cells if x1 < x2) {
        if (y1 < y2) c += BigInt(c1) * c2
        else if (y1 > y2) d += BigInt(c1) * c2
      }
      val g = if (c + d == 0) None
        else Some(((c - d) * 1000 / (c + d)).toLong)
      flag -> (c.toLong, d.toLong, g)
    }
    val got = run("q_kendall").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == want, s"$got vs $want")
    // discrimination: at least one flag has a non-zero gamma
    assert(got.values.exists(_._3.exists(_ != 0L)))
  }

  test("q_runs_test matches a sequential recount per type") {
    val evs = ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id", "unix_micros(ts)",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val n = rs.length.toLong
      val s = rs.map(_._4).sum
      val seq = rs.sortBy(r => (r._3, r._2))
        .map(r => BigInt(r._4) * n > BigInt(s))
      val nAbove = seq.count(identity).toLong
      val runs = 1L + seq.sliding(2).count(w =>
        w.length == 2 && w(0) != w(1))
      val exp = 1000L +
        (BigInt(2000) * nAbove * (n - nAbove) / n).toLong
      t -> (n, nAbove, n - nAbove, runs, exp, runs * 1000 - exp)
    }
    val got = run("q_runs_test").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == want, s"$got vs $want")
    // a pure-random sequence keeps |excess| small relative to n; the
    // readout must at least produce multiple runs everywhere
    assert(got.values.forall(_._4 > 1))
  }

  test("q_jackknife: pseudo-values and leave-one-out means exact") {
    val evs = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = evs.length.toLong
    val s = evs.map(_._2).sum
    val meanFull = (BigInt(s) * 1000 / n).toLong
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val nh = rs.length.toLong
      val sh = rs.map(_._2).sum
      val loo = (BigInt(s - sh) * 1000 / (n - nh)).toLong
      t -> (nh, meanFull, loo, n * meanFull - (n - nh) * loo)
    }
    val got = run("q_jackknife").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want, s"$got vs $want")
    // influence must differ across strata (the readout's point)
    assert(got.values.map(_._4).toSet.size > 1)
  }
}
