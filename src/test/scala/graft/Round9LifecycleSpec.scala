package graft

/** §2.94 lifecycle batch: sequential recounts of the DAU decomposition,
  * density bands, and reactivation marks at sf0.001. */
class Round9LifecycleSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val userDays: Map[Long, Seq[Long]] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq)
      .toMap

  test("q_new_vs_returning matches a first-seen recount") {
    val first = userDays.view.mapValues(_.min).toMap
    val want = userDays.toSeq.flatMap { case (u, ds) => ds.map(u -> _) }
      .groupBy(_._2).map { case (day, rs) =>
        val nNew = rs.count { case (u, _) => first(u) == day }.toLong
        day -> (rs.size.toLong, nNew, rs.size - nNew,
          nNew * 10000 / rs.size)
      }
    val got = run("q_new_vs_returning").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got == want, s"diff ${(got.toSet diff want.toSet).take(3)}")
    // day 1 is all-new; later days must have returners
    val firstDay = got.keys.min
    assert(got(firstDay)._4 == 10000L)
    assert(got(got.keys.max)._3 > 0)
  }

  test("q_lifespan_bands matches a density recount") {
    val evCount = ops.t(spark, sf, "events")
      .selectExpr("user_id").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = userDays.toSeq.map { case (u, ds) =>
      val span = ds.max - ds.min + 1
      val density = ds.size.toLong * 10000 / span
      val band = if (density < 7000) 0L else if (density < 8000) 1L
        else if (density < 9000) 2L else 3L
      (band, ds.size.toLong, evCount(u))
    }.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
    }
    val got = run("q_lifespan_bands").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.size >= 2, "all users in one density band — vacuous")
  }

  test("q_reactivation matches a gap recount") {
    val marks = userDays.toSeq.flatMap { case (_, ds) =>
      ds.sliding(2).collect { case Seq(a, b) if b - a > 2 => b }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val active = userDays.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = marks.map { case (day, n) =>
      day -> (active(day), n, n * 10000 / active(day))
    }
    val got = run("q_reactivation").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"diff ${(got.toSet diff want.toSet).take(3)}")
    assert(got.nonEmpty, "no reactivations at test SF — vacuous")
  }
}
