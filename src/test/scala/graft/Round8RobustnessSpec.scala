package graft

/** Round-8 §2.75 operator checks: segment SRM, winsor sensitivity,
  * and whale share against in-JVM brute force. */
class Round8RobustnessSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_srm_segments matches brute force and partitions users") {
    val ev = ops.t(spark, sf, "events").select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val seg = ev.groupBy(_._1).map { case (u, rs) =>
      val modal = rs.groupBy(_._2).toSeq
        .map { case (ty, o) => (ty, o.length) }
        .sortBy { case (ty, c) => (-c, ty) }.head._1
      (u, modal)
    }
    def armA(u: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$u:srmseg".getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0) < '8'
    }
    val expected = seg.groupBy(_._2).map { case (sg, us) =>
      val n = us.size.toLong
      val a = us.count(u => armA(u._1)).toLong
      (sg, n, a, a * 10000 / n, a * 10000 / n - 5000)
    }.toSet
    val got = run("q_srm_segments").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._2).sum == seg.size.toLong)
  }

  test("q_winsor_sensitivity matches brute force, shift >= 0") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      val p99 = sorted(((n * 99 + 99) / 100 - 1).toInt)
      val raw = sorted.sum
      val win = sorted.map(v => math.min(v, p99)).sum
      (ty, n, p99, raw * 1000 / n, win * 1000 / n,
        (raw - win) * 10000 / raw)
    }.toSet
    val got = run("q_winsor_sensitivity").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(r => r._6 >= 0 && r._5 <= r._4))
  }

  test("q_whale_share matches brute force and bounds hold") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      val p99 = sorted(((n * 99 + 99) / 100 - 1).toInt)
      val whales = rs.filter(_._2 >= p99)
      val tot = sorted.sum
      (ty, n, p99, whales.length.toLong, whales.map(_._2).sum, tot,
        whales.map(_._2).sum * 10000 / tot)
    }.toSet
    val got = run("q_whale_share").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).toSet
    assert(got == expected && expected.nonEmpty)
    // ~1% of rows carry their share; never more than 100%
    assert(got.forall(r => r._7 <= 10000 && r._4 >= r._2 / 100))
  }
}
