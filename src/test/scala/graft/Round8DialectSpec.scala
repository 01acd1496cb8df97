package graft

/** Round-8 §2.45 operator checks: multiset set-op algebra, boolean
  * aggregates, and IGNORE-NULLS LOCF against in-JVM brute force. */
class Round8DialectSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val flagCounts: Map[Long, (Long, Long)] = {
    val li = ops.t(spark, sf, "lineitem")
      .select("l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    li.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.count(_._2 == "R").toLong, rs.count(_._2 == "A").toLong) }
  }

  test("q_except_all keeps exact excess multiplicities") {
    val expected = flagCounts.collect {
      case (k, (r, a)) if r > a => (k, r - a) }.toSet
    val got = run("q_except_all").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_intersect_all keeps exact matched multiplicities") {
    val expected = flagCounts.collect {
      case (k, (r, a)) if math.min(r, a) > 0 => (k, math.min(r, a)) }.toSet
    val got = run("q_intersect_all").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
    // bag decomposition: excess + matched = total R occurrences
    val exc = run("q_except_all").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val totR = flagCounts.values.map(_._1).sum
    assert(exc.values.sum + got.toMap.values.sum == totR)
  }

  test("q_agg_bools matches brute-force boolean aggregates") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, rs) =>
      (t, rs.forall(_._2 > 1000), rs.exists(_._2 > 40000),
        rs.count(_._2 > 10000).toLong, rs.length.toLong)
    }.toSet
    val got = run("q_agg_bools").collect().map(r => (r.getString(0),
      r.getBoolean(1), r.getBoolean(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_window_locf carries the last purchase forward per user") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_id", "user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT)", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (u, rs) =>
      var lastP: Option[Long] = None
      rs.sortBy(r => (r._5, r._1)).map { r =>
        if (r._3 == "purchase") lastP = Some(r._4)
        (r._1, u, lastP)
      }.toSeq
    }.toSet
    val got = run("q_window_locf").collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toSet
    assert(got == expected && expected.nonEmpty)
    // both outcomes occur: rows before any purchase stay NULL
    assert(got.exists(_._3.isEmpty) && got.exists(_._3.nonEmpty))
  }
}
