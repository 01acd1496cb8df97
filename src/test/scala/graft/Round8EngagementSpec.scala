package graft

/** Round-8 §2.50 operator checks: in-JVM brute-force recomputation of
  * the engagement-analytics batch. */
class Round8EngagementSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, String, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q_type_affinity matches brute-force audience overlap") {
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).toSet }
    val types = ev.map(_._2).distinct.sorted
    val marg = types.map(t => t -> byUser.values.count(_.contains(t)).toLong)
      .toMap
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
      a = types(i); b = types(j)
      both = byUser.values.count(s => s(a) && s(b)).toLong
      if both > 0
    } yield (a, b, both, marg(a), marg(b),
      both * 10000 / (marg(a) + marg(b) - both))).toSet
    val got = run("q_type_affinity").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_active_days matches the brute-force engagement histogram") {
    val perUser = ev.map(r => (r._1, r._3)).distinct
      .groupBy(_._1).map { case (_, ds) => ds.length.toLong }
    val expected = perUser.groupBy(identity)
      .map { case (d, os) => (d, os.size.toLong) }.toSet
    val got = run("q_active_days").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
    // user conservation: histogram masses sum to the distinct user count
    assert(got.toSeq.map(_._2).sum == ev.map(_._1).distinct.length.toLong)
  }

  test("q_stickiness matches brute force and lands in (0, 10000]") {
    val tdu = ev.map(r => (r._2, r._3, r._1)).distinct
    val expected = tdu.groupBy(_._1).map { case (t, rs) =>
      val nDays = rs.map(_._2).distinct.length.toLong
      val actives = rs.map(_._3).distinct.length.toLong
      (t, nDays, rs.length.toLong, actives,
        rs.length.toLong * 10000 / (nDays * actives))
    }.toSet
    val got = run("q_stickiness").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(r => r._5 > 0 && r._5 <= 10000))
  }
}
