package graft

/** Round-8 §2.71 operator checks: sample bias, stratified gain, and
  * sample CI against in-JVM brute force over the same md5 gates. */
class Round8SamplingSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5Gate(id: Long, salt: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$salt".getBytes("UTF-8"))
    "%02x".format(d(0)).charAt(0) == '0'
  }

  test("q_sample_bias matches brute force and deviations are small") {
    val ev = ops.t(spark, sf, "events").select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val n = rs.length.toLong
      val ns = rs.count(r => md5Gate(r._2, "bias")).toLong
      (ty, n, ns, ns * 10000 / n, ns * 10000 / n - 625)
    }.toSet
    val got = run("q_sample_bias").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // a uniform hash gate should sit within a few hundred bp of 625
    assert(got.forall(r => math.abs(r._5) < 400))
  }

  test("q_stratified_gain matches brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // per stratum: population N_h, exact total, sample count m_h,
    // sample sum — the post-stratified estimator is Σ N_h·x̄_h
    val st = ev.groupBy(_._1).map { case (_, rs) =>
      val smp = rs.filter(r => md5Gate(r._2, "strat"))
      (rs.length.toLong, rs.map(_._3).sum,
        smp.length.toLong, smp.map(_._3).sum)
    }.toSeq
    val truth = st.map(_._2).sum
    val srs = st.map(_._4).sum * 16
    val strat = st.map { case (nh, _, mh, ss) =>
      if (mh > 0) nh * ss / mh else 0L }.sum
    val r = run("q_stratified_gain").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((st.size.toLong, truth, srs, strat,
        math.abs(srs - truth) * 10000 / truth,
        math.abs(strat - truth) * 10000 / truth)))
    // the fix's point: the two estimators are no longer algebraically
    // identical — on this fixture the realized per-stratum rates differ
    // from 1/16, so the estimates must actually diverge
    assert(r.getLong(2) != r.getLong(3),
      "post-stratified estimate degenerated back to the simple expansion")
  }

  test("q_sample_ci matches brute force and half-widths are positive") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val nPop = rs.length.toLong
      val smp = rs.filter(r => md5Gate(r._2, "ci"))
      val n = smp.length.toLong
      val sx = smp.map(_._3).sum
      val qx = smp.map(r => r._3 * r._3).sum
      val mean: Any = if (n == 0) null else sx * 1000 / n
      val hw: Any = if (n < 2) null
      else math.round(1.96 * math.sqrt(
        ((qx.toDouble - sx.toDouble * sx / n) / (n - 1)) / n *
          ((nPop - n).toDouble / (nPop - 1))) * 1000)
      (ty, nPop, n, mean, hw)
    }.toSet
    val got = run("q_sample_ci").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    got.foreach { r =>
      if (r._5 != null) assert(r._5.asInstanceOf[Long] >= 0)
    }
  }
}
