package graft

/** Round-7 §2.28 operator checks: in-JVM brute-force recomputation of
  * the text/growth batch (containment report, windowed co-occurrence,
  * growth accounting) — complementing the driver's DuckDB oracle with
  * ground truth derived from first principles on collected fixture
  * rows. */
class Round7FinalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val enDocs: Array[(Long, Array[String])] =
    ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ")))

  // --- q_containment ---------------------------------------------------

  test("q_containment matches brute-force per-doc containment") {
    val sets = enDocs.map { case (id, ts) =>
      (id, ts.filter(_.nonEmpty).toSet) }
    val expected = sets.map { case (d, sd) =>
      val nd = sd.size.toLong
      val commons = sets.filter(_._1 != d)
        .map { case (_, se) => (sd intersect se).size.toLong }
        .filter(_ > 0)
      val containers = commons.count(c => c * 10 >= nd * 9).toLong
      val best = if (commons.isEmpty) 0L
                 else commons.map(c => c * 10000 / nd).max
      (d, nd, containers, best) }.toSet
    // non-trivial: containment counts and shares must vary across docs
    // (at sf0.001 the 31-token vocabulary makes every doc a near-subset
    // of some other, so "a doc with zero containers" is not guaranteed)
    assert(expected.exists(_._3 > 0))
    assert(expected.map(_._4).size > 1 && expected.map(_._3).max >= 2)
    val got = run("q_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_window_cooccur ------------------------------------------------

  test("q_window_cooccur matches brute-force context pairs") {
    val counts = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    for ((_, ts) <- enDocs; i <- ts.indices; j <- (i + 1) to
           math.min(i + 2, ts.length - 1)) {
      val k = if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
      counts(k) += 1
    }
    val expected = counts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(30)
      .map { case ((a, b), c) => (a, b, c) }.toSet
    assert(expected.size == 30)
    val got = run("q_window_cooccur").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- q_share_of_parent -----------------------------------------------

  test("q_share_of_parent matches brute-force hierarchy shares") {
    val natName = ops.t(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        (r.getString(1), r.get(2).asInstanceOf[Number].longValue))).toMap
    val regName = ops.t(spark, sf, "region")
      .select("r_regionkey", "r_name").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue, r.getString(1)))
      .toMap
    val custNat = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.get(0).asInstanceOf[Number].longValue,
        r.get(1).asInstanceOf[Number].longValue)).toMap
    val per = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (ck, _) =>
        val (nn, rk) = natName(custNat(ck)); (regName(rk), nn) }
      .map { case (k, xs) => (k, xs.map(_._2).sum) }
    val regTot = per.groupBy(_._1._1).map { case (rg, m) =>
      (rg, m.values.sum) }
    val total = per.values.sum
    val expected = per.map { case ((rg, nn), c) =>
      (rg, nn, c, c * 10000 / regTot(rg), regTot(rg) * 10000 / total) }
      .toSet
    assert(expected.size > 5)
    val got = run("q_share_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_moving_extrema ------------------------------------------------

  test("q_moving_extrema matches brute-force rolling envelope") {
    val daily = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case (k, xs) => (k, xs.map(_._3).sum) }
    val expected = daily.groupBy(_._1._1).flatMap { case (et, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      days.zipWithIndex.map { case ((d, c), i) =>
        val frame = days.slice(math.max(0, i - 6), i + 1).map(_._2)
        (et, d, c, frame.min, frame.max) }
    }.toSet
    assert(expected.exists(e => e._4 != e._5))
    val got = run("q_moving_extrema").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_percent_change ------------------------------------------------

  test("q_percent_change matches brute-force signed deltas") {
    val weekly = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 604800000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case (k, xs) => (k, xs.map(_._3).sum) }
    val expected = weekly.groupBy(_._1._1).flatMap { case (et, m) =>
      val weeks = m.toSeq.map { case ((_, w), c) => (w, c) }.sortBy(_._1)
      weeks.zipWithIndex.map { case ((w, c), i) =>
        if (i == 0) (et, w, c, None: Option[Long], None: Option[Long],
          None: Option[Long])
        else {
          val p = weeks(i - 1)._2
          // truncation toward zero on the signed delta, like both engines
          val bp = if (c >= p) (c - p) * 10000 / p else -((p - c) * 10000 / p)
          (et, w, c, Some(p), Some(c - p), Some(bp))
        } }
    }.toSet
    // sign coverage: some week must decline, some must grow
    assert(expected.exists(_._6.exists(_ < 0)) &&
      expected.exists(_._6.exists(_ > 0)))
    val got = run("q_percent_change").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    assert(got == expected)
  }

  // --- q_growth_accounting ---------------------------------------------

  test("q_growth_accounting matches brute-force decomposition") {
    val uw = ops.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = uw.groupBy(_._1).map { case (u, xs) =>
      (u, xs.map(_._2).toSet) }
    val firstW = byUser.map { case (u, ws) => (u, ws.min) }
    val days = uw.map(_._2).distinct
    val expected = days.map { w =>
      val active = byUser.filter(_._2.contains(w)).keySet
      val nNew = active.count(u => firstW(u) == w).toLong
      val retained = active.count(u => byUser(u).contains(w - 1)).toLong
      val resurrected = active.count(u =>
        firstW(u) != w && !byUser(u).contains(w - 1)).toLong
      val churned = byUser.count { case (u, ws) =>
        ws.contains(w - 1) && !ws.contains(w) }.toLong
      (w, active.size.toLong, nNew, retained, resurrected, churned)
    }.toSet
    // the decomposition identity must hold on every reported day, and
    // the daily grain makes every bucket non-trivial (weekly would not:
    // the fixture's users are all weekly-active by generation)
    assert(expected.forall(e => e._2 == e._3 + e._4 + e._5))
    assert(expected.exists(_._5 > 0) && expected.exists(_._6 > 0))
    val got = run("q_growth_accounting").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }
}
