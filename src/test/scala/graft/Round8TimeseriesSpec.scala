package graft

/** Round-8 §2.43 operator checks: in-JVM brute-force recomputation of
  * the changepoint / drawdown / seasonal-strength diagnostics. */
class Round8TimeseriesSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Per type: the (day, dollars) daily series, day-ascending. */
  private lazy val series: Map[String, Seq[(Long, Long)]] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2))
      .map { case ((t, d), rs) => (t, d, rs.map(_._3).sum / 100) }
      .groupBy(_._1)
      .map { case (t, rs) =>
        t -> rs.map(r => (r._2, r._3)).toSeq.sortBy(_._1) }

  test("q_changepoint matches the brute-force CUSUM argmax") {
    val expected = series.map { case (t, ds) =>
      val n = ds.size.toLong
      val tot = ds.map(_._2).sum
      val scored = ds.zipWithIndex.scanLeft((0L, 0L, 0L)) {
        case ((_, _, cum), ((day, v), i)) =>
          (day, n * (cum + v) - (i + 1) * tot, cum + v)
      }.drop(1)
      val best = scored.minBy { case (day, sn, _) => (-math.abs(sn), day) }
      (t, best._1, math.abs(best._2), best._2.sign)
    }.toSet
    val got = run("q_changepoint").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_drawdown matches the brute-force peak-to-trough") {
    val expected = series.map { case (t, ds) =>
      var cum = 0L; var peak = 0L
      val rows = ds.map { case (day, v) =>
        cum += v; peak = math.max(peak, cum); (day, peak, peak - cum)
      }
      val best = rows.minBy { case (day, _, dd) => (-dd, day) }
      (t, best._1, best._2, best._3)
    }.toSet
    val got = run("q_drawdown").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // drawdown of a nonneg daily series: 0 <= dd <= peak
    assert(got.forall(r => r._4 >= 0 && r._4 <= r._3))
  }

  test("q_seasonal_strength matches brute force, ss in [0, 10000]") {
    val expected = series.map { case (t, ds) =>
      val n = ds.size.toLong
      val tot = ds.map(_._2).sum
      val mm = tot * 1000 / n
      val sst = ds.map { case (_, v) =>
        val d = v * 1000 - mm; d * d }.sum
      val ssb = ds.groupBy { case (day, _) => (day + 3) % 7 }
        .map { case (_, ws) =>
          val mw = ws.size.toLong
          val wdev = ws.map(_._2).sum * 1000 / mw - mm
          mw * wdev * wdev
        }.sum
      (t, n, ssb, sst, ssb * 10000 / sst)
    }.toSet
    val got = run("q_seasonal_strength").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(r => r._5 >= 0 && r._5 <= 10000))
  }
}
