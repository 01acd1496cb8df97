package graft

/** Round-8 §2.77 operator checks: second-digit Benford, round-number
  * bias, and duplicate payments against in-JVM brute force. */
class Round8ForensicSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("benford2Bp literals are a probability distribution") {
    val bp = ops.Forensic.benford2Bp
    assert(bp.length == 10)
    // sums to 100% up to the per-digit rounding, and is decreasing
    assert(math.abs(bp.sum - 10000) <= 5)
    assert(bp.toSeq == bp.toSeq.sorted.reverse)
  }

  test("q_benford2 matches brute force") {
    val os = ops.t(spark, sf, "orders")
      .selectExpr("o_orderstatus", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 >= 10)
      .map(r => (r._1, r._2.toString.substring(1, 2).toLong))
    val expected = os.groupBy(_._1).flatMap { case (st, rs) =>
      val tot = rs.length.toLong
      rs.groupBy(_._2).map { case (d, o) =>
        val share = o.length.toLong * 10000 / tot
        (st, d, o.length.toLong, share,
          share - ops.Forensic.benford2Bp(d.toInt))
      }
    }.toSet
    val got = run("q_benford2").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_round_bias matches brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type",
        "pmod(CAST(round(value * 100) AS BIGINT), 100)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val n = rs.length.toLong
      val (a, b, c) = (rs.count(_._2 == 0L).toLong,
        rs.count(_._2 == 50L).toLong, rs.count(_._2 == 99L).toLong)
      (ty, n, a, b, c, (a + b + c) * 10000 / n - 300)
    }.toSet
    val got = run("q_round_bias").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_dup_payments matches brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "user_id",
        "CAST(round(value * 100) AS BIGINT) div 100",
        "unix_micros(ts) div 86400000000")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(identity).toSeq
      .map { case (k, o) => (k._1, k._3, o.length.toLong) }
      .filter(_._3 >= 2)
      .groupBy(_._1).map { case (ty, gs) =>
        (ty, gs.length.toLong, gs.map(_._3 - 1).sum,
          gs.map(g => (g._3 - 1) * g._2).sum)
      }.toSet
    val got = run("q_dup_payments").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
