package graft

/** Round-8 §2.47 operator checks: multi-agg pivot, discrete
  * percentiles, and tolerance/direction as-of against brute force. */
class Round8AsofPivotSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_pivot_multi matches brute-force two-measure crosstab") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val expected = ev.groupBy(_._1).map { case (u, rs) =>
      u -> types.flatMap { t =>
        val sub = rs.filter(_._2 == t)
        Seq(sub.length.toLong, sub.map(_._3).sum)
      }
    }.toSet
    val got = run("q_pivot_multi").collect()
      .map(r => r.getLong(0) -> (1 to 10).map(r.getLong).toList).toSet
    assert(got == expected.map { case (u, v) => u -> v.toList }
      && expected.nonEmpty)
  }

  test("q_percentile_disc picks the smallest value reaching p") {
    val orders = ops.t(spark, sf, "orders")
      .selectExpr("o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = orders.groupBy(_._1).map { case (p, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(pct: Int): Long =
        sorted(((n * pct + 99) / 100 - 1).toInt)
      (p, n, disc(50), disc(90), disc(99))
    }.toSet
    val got = run("q_percentile_disc").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // discrete percentiles are actual data values and monotone
    assert(got.forall(r => r._3 <= r._4 && r._4 <= r._5))
  }

  test("q_asof_tolerance applies both directions and tolerances") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._4, r._1))
      sorted.indices.map { i =>
        val us = sorted(i)._4
        val prev = sorted.take(i).filter(_._3 == "signup")
          .map(_._4).maxOption
        val next = sorted.drop(i + 1).filter(_._3 == "error")
          .map(_._4).minOption
        (sorted(i)._1, u,
          prev.filter(p => us - p <= 86400000000L),
          next.filter(nx => nx - us <= 3600000000L))
      }.toSeq
    }.toSet
    val got = run("q_asof_tolerance").collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSet
    assert(got == expected && expected.nonEmpty)
    // the tolerance genuinely filters: some matches exist, some are cut
    assert(got.exists(_._3.nonEmpty) && got.exists(_._3.isEmpty))
  }
}
