package graft

/** Round-8 §2.74 operator checks: cohort LTV, ARPU, and payback week
  * against in-JVM brute force. */
class Round8LtvSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def events: Array[(Long, String, Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "unix_micros(ts) div 604800000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("q_cohort_ltv matches brute force and is cumulative") {
    val ev = events
    val cohort = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._3).min }
    val sizes = cohort.values.groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val cells = ev.filter(_._2 == "purchase")
      .groupBy(r => (cohort(r._1), r._3 - cohort(r._1)))
      .map { case (k, rs) =>
        (k._1, k._2, rs.length.toLong, rs.map(_._4).sum) }.toSeq
    val expected = cells.groupBy(_._1).flatMap { case (cw, rs) =>
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      sorted.map { case (_, off, np, rev) =>
        cum += rev
        (cw, off, sizes(cw), np, rev, cum * 1000 / sizes(cw))
      }
    }.toSet
    val got = run("q_cohort_ltv").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // cumulative LTV never decreases along a cohort
    got.toSeq.groupBy(_._1).foreach { case (_, rs) =>
      val curve = rs.sortBy(_._2).map(_._6)
      assert(curve == curve.sorted)
    }
  }

  test("q_arpu matches brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("unix_micros(ts) div 2592000000000", "user_id",
        "event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((m, _), rs) =>
        val rev = rs.filter(_._3 == "purchase").map(_._4).sum
        (m, rev, if (rs.exists(_._3 == "purchase")) 1L else 0L)
      }.groupBy(_._1).map { case (m, us) =>
        val n = us.length.toLong
        val rev = us.map(_._2).sum
        val p = us.map(_._3).sum
        (m, n, p, rev, rev * 1000 / n, p * 10000 / n)
      }.toSet
    val got = run("q_arpu").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_payback is consistent with the LTV curve") {
    val curve = run("q_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    val rows = run("q_payback").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cw = r.getLong(0)
      val cohortCurve = curve.filter(_._1 == cw)
      assert(r.getLong(2) == cohortCurve.map(_._3).max)
      val cross = cohortCurve.filter(_._3 >= 1000000L).map(_._2)
      if (cross.isEmpty) assert(r.isNullAt(3))
      else assert(r.getLong(3) == cross.min)
    }
  }
}
