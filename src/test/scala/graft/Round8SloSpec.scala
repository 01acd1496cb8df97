package graft

/** Round-8 §2.83 operator checks: freshness, ingest rate, and SLA
  * attainment against in-JVM brute force. */
class Round8SloSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_freshness matches brute force; some type is fully fresh") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts)",
        "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hwUs = ev.map(_._2).max
    val hwDay = ev.map(_._3).max
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val n = rs.length.toLong
      val nDays = rs.map(_._3).distinct.length.toLong
      val lastDayN = rs.count(_._3 == hwDay).toLong
      (ty, n, nDays, hwUs - rs.map(_._2).max, lastDayN,
        lastDayN * nDays * 10000 / n)
    }.toSet
    val got = run("q_freshness").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.exists(_._4 == 0L))
  }

  test("q_ingest_rate matches brute force; peak >= mean") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 3600000000")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val hours = rs.groupBy(_._2).values.map(_.length.toLong).toSeq
      val ah = hours.length.toLong
      val n = hours.sum
      val peak = hours.max
      (ty, ah, n, n * 1000 / ah, peak, peak * 1000 * ah / n)
    }.toSet
    val got = run("q_ingest_rate").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(_._6 >= 1000L))
  }

  test("q_sla_attainment matches brute force and is monotone") {
    val od = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(o_orderdate) div 86400000000")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "unix_micros(l_shipdate) div 86400000000")
      .collect().map { r =>
        val (pri, d) = od(r.getLong(0))
        (pri, r.getLong(1) - d)
      }
    val expected = li.groupBy(_._1).map { case (p, rs) =>
      val n = rs.length.toLong
      val w7 = rs.count(_._2 <= 7L).toLong
      val w30 = rs.count(_._2 <= 30L).toLong
      (p, n, w7, w30, w7 * 10000 / n, w30 * 10000 / n)
    }.toSet
    val got = run("q_sla_attainment").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(r => r._3 <= r._4))
  }
}
