package graft

/** Round-8 §2.53 operator checks: rolling beta, log histogram, peak
  * hour against in-JVM brute force. */
class Round8TemporalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(String, Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts)",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q_rolling_beta matches brute-force trailing-window OLS") {
    val daily = ev.filter(r => r._1 == "purchase" || r._1 == "view")
      .groupBy(_._2 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (d, rs) =>
        (d, rs.filter(_._1 == "view").map(_._3).sum / 100000,
          rs.filter(_._1 == "purchase").map(_._3).sum / 100000)
      }
    val expected = daily.indices.map { i =>
      val wnd = daily.slice(math.max(0, i - 6), i + 1)
      val n = wnd.size.toLong
      val sx = wnd.map(_._2).sum; val sy = wnd.map(_._3).sum
      val sxx = wnd.map(w => w._2 * w._2).sum
      val sxy = wnd.map(w => w._2 * w._3).sum
      val den = n * sxx - sx * sx
      (daily(i)._1, n,
        if (den == 0) None else Some((n * sxy - sx * sy) * 1000 / den))
    }.toSet
    val got = run("q_rolling_beta").collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_log_histogram matches brute-force bit-length binning") {
    val expected = ev.filter(_._3 > 0)
      .groupBy(r => (r._1, java.lang.Long.toBinaryString(r._3).length.toLong))
      .map { case ((t, b), rs) =>
        (t, b, rs.length.toLong, rs.map(_._3).min, rs.map(_._3).max)
      }.toSet
    val got = run("q_log_histogram").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // bin bounds respect the power-of-two envelope
    assert(got.forall(r => r._4 >= (1L << (r._2 - 1)) &&
      r._5 < (1L << r._2.toInt)))
  }

  test("q_peak_hour matches the brute-force argmax") {
    val expected = ev.groupBy(_._1).map { case (t, rs) =>
      val byHour = rs.groupBy(r => (r._2 / 3600000000L) % 24)
        .map { case (h, o) => (h, o.length.toLong) }
      val (h, n) = byHour.toSeq.minBy { case (h, n) => (-n, h) }
      (t, h, n, n * 10000 / rs.length)
    }.toSet
    val got = run("q_peak_hour").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
