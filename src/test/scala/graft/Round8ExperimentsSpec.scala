package graft

/** Round-8 §2.35 operator checks: in-JVM brute-force recomputation of
  * the experimentation-statistics batch (KS, Mann–Whitney, bootstrap CI,
  * stratified ATE, EB shrinkage, ordinal SAX) from collected fixture
  * rows — complementing the driver's DuckDB oracle. */
class Round8ExperimentsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (event_type, event_id, user_id, epoch_us, cents, k) fixture rows. */
  private lazy val events: Array[(String, Long, Long, Long, Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id", "user_id",
        "CAST(unix_micros(ts) AS BIGINT)",
        "CAST(round(value * 100) AS BIGINT)",
        "CAST(get_json_object(props, '$.k') AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  private lazy val view: Array[Long] =
    events.filter(_._1 == "view").map(_._5)

  test("q_ks_test matches the brute-force ECDF max gap") {
    val expected = events.map(_._1).distinct.filter(_ != "view").map { t =>
      val s1 = events.filter(_._1 == t).map(_._5)
      val (n1, n2) = (s1.length.toLong, view.length.toLong)
      val grid = (s1 ++ view).distinct.sorted
      val dNum = grid.map { v =>
        math.abs(s1.count(_ <= v) * n2 - view.count(_ <= v) * n1)
      }.max
      (t, n1, n2, dNum, dNum * 10000 / (n1 * n2))
    }.toSet
    assert(expected.nonEmpty && expected.forall(_._4 > 0))
    val got = run("q_ks_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_mannwhitney matches the tie-corrected rank-sum U") {
    val expected = events.map(_._1).distinct.filter(_ != "view").map { t =>
      val s1 = events.filter(_._1 == t).map(_._5)
      val all = s1.map((_, true)) ++ view.map((_, false))
      val (n1, n2) = (s1.length.toLong, view.length.toLong)
      // 2×average-rank of each element under the sorted combined sample
      val r12x = all.filter(_._2).map { case (v, _) =>
        val less = all.count(_._1 < v).toLong
        val eq = all.count(_._1 == v).toLong
        2 * less + eq + 1
      }.sum
      val u2x = r12x - n1 * (n1 + 1)
      (t, n1, n2, u2x, u2x * 10000 / (2 * n1 * n2))
    }.toSet
    val got = run("q_mannwhitney").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  /** The md5-derived Poisson weight, recomputed byte-for-byte. */
  private def bootWeight(eventId: Long, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$eventId:$b:bs".getBytes("UTF-8"))
    val hm = java.lang.Long.parseLong(
      d.take(3).map(x => f"${x & 0xff}%02x").mkString, 16) % 1000
    if (hm < 368) 0L else if (hm < 736) 1L else if (hm < 920) 2L
    else if (hm < 981) 3L else 4L
  }

  test("q_bootstrap_ci matches brute-force replicate quantiles") {
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val expected = events.groupBy(_._1).map { case (t, rows) =>
      val reps = (0 until 32).map { b =>
        val ws = rows.map(r => (bootWeight(r._2, b), r._5))
        val sw = ws.map(_._1).sum
        (b, ws.map { case (w, c) => w * c }.sum.toDouble / sw, sw)
      }.filter(_._3 > 0)
      val ordered = reps.sortBy(r => (r._2, r._1))
      (t, rows.length.toLong,
        r4(rows.map(_._5).sum.toDouble / rows.length),
        ordered.length.toLong, r4(ordered(1)._2), r4(ordered(30)._2))
    }.toSet
    val got = run("q_bootstrap_ci").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected)
    // the CI must bracket the point estimate on every type
    got.foreach { case (t, _, est, _, lo, hi) =>
      assert(lo <= est && est <= hi, s"$t: CI [$lo,$hi] misses $est") }
  }

  test("q_ate_stratified matches the exact millicent effect") {
    val per = events.groupBy(_._1).map { case (t, rows) =>
      val (tr, ct) = rows.partition(_._6 % 2 == 1)
      val (nt, nc) = (tr.length.toLong, ct.length.toLong)
      val (st, sc) = (tr.map(_._5).sum, ct.map(_._5).sum)
      (t, nt, nc, (st * nc - sc * nt) * 1000 / (nt * nc))
    }
    val all = ("ALL", per.map(_._2).sum, per.map(_._3).sum,
      per.map(p => (p._2 + p._3) * p._4).sum /
        per.map(p => p._2 + p._3).sum)
    val got = run("q_ate_stratified").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == per.toSet + all)
  }

  test("q_eb_shrinkage pulls small users toward the global mean") {
    val gs = events.map(_._5).sum
    val gn = events.length.toLong
    val expected = events.groupBy(_._3).map { case (u, rows) =>
      val (us, un) = (rows.map(_._5).sum, rows.length.toLong)
      (u, un, us * 1000 / un, (us * gn + 10 * gs) * 1000 / (gn * (un + 10)))
    }.toSet
    val got = run("q_eb_shrinkage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // shrinkage property: |shrunk − global| ≤ |raw − global| on every user
    val gmc = gs * 1000 / gn
    got.foreach { case (u, _, raw, shrunk) =>
      assert(math.abs(shrunk - gmc) <= math.abs(raw - gmc) + 1,
        s"user $u: shrunk $shrunk further from $gmc than raw $raw") }
  }

  test("q_sax_symbols matches brute-force ordinal symbolization") {
    val expected = events.groupBy(_._3).map { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2)).map(_._5)
      val n = ordered.length
      // ntile(4): first (n mod 4) tiles get ⌈n/4⌉ rows
      val base = n / 4; val extra = n % 4
      val sizes = (0 until 4).map(i =>
        if (n < 4) (if (i < n) 1 else 0) else base + (if (i < extra) 1 else 0))
      val segs = sizes.scanLeft(0)(_ + _).sliding(2).toSeq.zipWithIndex
        .collect { case (Seq(a, b), i) if b > a =>
          (i + 1, ordered.slice(a, b)) }
      val ranked = segs.map { case (seg, vs) =>
        (seg, vs.sum.toDouble / vs.length, vs.length) }
        .sortBy { case (seg, m, _) => (m, seg) }.zipWithIndex
        .map { case ((seg, _, sn), i) => (seg, ('a' + i).toChar, sn) }
      (u, rows.length.toLong,
        ranked.sortBy(_._1).map(_._2).mkString)
    }.toSet
    val got = run("q_sax_symbols").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expected)
    assert(got.exists(_._3.length == 4))
  }
}
