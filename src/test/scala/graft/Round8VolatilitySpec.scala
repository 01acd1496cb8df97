package graft

/** Round-8 §2.79 operator checks: realized volatility, VaR, and
  * streaks against in-JVM brute force on the same daily series. */
class Round8VolatilitySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (type, day, cents, prevCents) after the observation lag. */
  private def daily: Seq[(String, Long, Long, Long)] = {
    val d = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((ty, day), rs) => (ty, day, rs.map(_._3).sum) }
    d.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(_._2).toList
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        (b._1, b._2, b._3, a._3) }
    }
  }

  test("q_realized_vol matches brute-force quantized moments") {
    val expected = daily.groupBy(_._1).map { case (ty, rs) =>
      val r = rs.map(x =>
        math.round(math.log(x._3.toDouble / x._4) * 1000000))
      val n = r.length.toLong
      val sr = r.sum
      val qr = r.map(x => x * x).sum
      val vol: Any = if (n < 2) null
      else math.round(math.sqrt(
        (qr.toDouble - sr.toDouble * sr / n) / (n - 1)))
      (ty, n, sr, vol)
    }.toSet
    val got = run("q_realized_vol").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_var95 matches brute-force discrete percentile of deltas") {
    val expected = daily.groupBy(_._1).map { case (ty, rs) =>
      val deltas = rs.map(x => x._3 - x._4).sorted
      val n = deltas.length.toLong
      val v = deltas(((n * 5 + 99) / 100 - 1).toInt)
      (ty, n, v, deltas.min)
    }.toSet
    val got = run("q_var95").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // worst day is at or below the 5th percentile
    assert(got.forall(r => r._4 <= r._3))
  }

  test("q_streaks matches brute-force run lengths") {
    val expected = daily.groupBy(_._1).map { case (ty, rs) =>
      val signs = rs.sortBy(_._2)
        .map(x => java.lang.Long.signum(x._3 - x._4))
      val runs = collection.mutable.ArrayBuffer.empty[(Int, Long)]
      signs.foreach { s =>
        if (runs.nonEmpty && runs.last._1 == s)
          runs(runs.length - 1) = (s, runs.last._2 + 1)
        else runs += ((s, 1L))
      }
      def tot(s: Int) = runs.filter(_._1 == s).map(_._2).sum
      def mx(s: Int) =
        (runs.filter(_._1 == s).map(_._2) :+ 0L).max
      (ty, tot(1), tot(-1), mx(1), mx(-1))
    }.toSet
    val got = run("q_streaks").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
