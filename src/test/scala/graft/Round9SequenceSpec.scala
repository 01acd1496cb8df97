package graft

/** §2.89 sequence-dynamics batch: in-memory sequential recounts of the
  * switch-rate bands, dwell bands, and ping-pong triples at sf0.001. */
class Round9SequenceSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val byUser: Map[Long, Seq[(Long, String)]] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(r => (r._4, r._2)).map(r => (r._4, r._3)).toSeq).toMap

  test("q_switch_rate matches a sequential recount") {
    val perUser = byUser.values.map { evs =>
      val types = evs.map(_._2)
      val nTrans = (types.length - 1).toLong
      val nSwitch = types.sliding(2).count(w =>
        w.length == 2 && w(0) != w(1)).toLong
      val band = if (nTrans == 0) -1L
        else math.min(nSwitch * 10000 / nTrans, 9999L) / 2000
      (band, nTrans, nSwitch)
    }.toSeq
    val want = perUser.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
    }
    val got = run("q_switch_rate").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.keySet.size > 1, "all users in one band — vacuous")
  }

  test("q_dwell_bins matches a sequential recount") {
    def band(gap: Long): Long =
      if (gap < 1000000L) 0 else if (gap < 10000000L) 1
      else if (gap < 60000000L) 2 else if (gap < 600000000L) 3
      else if (gap < 3600000000L) 4 else 5
    val gaps = byUser.values.flatMap { evs =>
      evs.sliding(2).collect { case Seq((u1, _), (u2, t2)) =>
        (t2, band(u2 - u1))
      }
    }.toSeq
    val perType = gaps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = gaps.groupBy(identity).map { case ((t, b), rs) =>
      (t, b) -> (rs.size.toLong, perType(t),
        rs.size.toLong * 10000 / perType(t))
    }
    val got = run("q_dwell_bins").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want,
      s"diff ${(got.toSet diff want.toSet).take(3)} vs " +
        s"${(want.toSet diff got.toSet).take(3)}")
    assert(got.keys.map(_._2).toSet.size >= 3, "too few dwell bands")
  }

  test("q_ping_pong matches a sequential triple recount") {
    val trips = byUser.toSeq.flatMap { case (u, evs) =>
      evs.map(_._2).sliding(3).collect {
        case Seq(a, b, c) if a == c && a != b => (c, b, u)
      }
    }
    val want = trips.groupBy(t => (t._1, t._2)).map { case (k, rs) =>
      k -> (rs.size.toLong, rs.map(_._3).distinct.size.toLong)
    }
    val got = run("q_ping_pong").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.nonEmpty, "no ping-pong triples at test SF — vacuous")
  }
}
