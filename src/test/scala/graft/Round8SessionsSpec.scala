package graft

/** Round-8 §2.62 operator checks: session depth, bounce rate, and
  * entry/exit profile against an in-JVM sessionizer. */
class Round8SessionsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (depth, entryType, exitType) per session, brute-forced. */
  private def sessions: Seq[(Long, String, String)] = {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    ev.groupBy(_._1).values.flatMap { rs =>
      val sorted = rs.sortBy(r => (r._4, r._2))
      val out = collection.mutable.ArrayBuffer
        .empty[collection.mutable.ArrayBuffer[(Long, Long, String, Long)]]
      var prev: Long = Long.MinValue
      sorted.foreach { r =>
        if (out.isEmpty || r._4 - prev > 1800000000L)
          out += collection.mutable.ArrayBuffer(r)
        else out.last += r
        prev = r._4
      }
      out.map(ss => (ss.length.toLong, ss.head._3, ss.last._3))
    }.toSeq
  }

  test("q_session_depth matches the brute-force sessionizer") {
    val ss = sessions
    val tot = ss.length.toLong
    val expected = ss.groupBy(_._1).map { case (k, o) =>
      (k, o.length.toLong, o.length.toLong * 10000 / tot) }.toSet
    val got = run("q_session_depth").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._2).sum == tot)
  }

  test("q_bounce_rate matches brute force and is a sub-count") {
    val ss = sessions
    val expected = ss.groupBy(_._2).map { case (ty, o) =>
      val n = o.length.toLong
      val b = o.count(_._1 == 1L).toLong
      (ty, n, b, b * 10000 / n)
    }.toSet
    val got = run("q_bounce_rate").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_entry_exit margins both sum to the session count") {
    val ss = sessions
    val tot = ss.length.toLong
    val en = ss.groupBy(_._2).map { case (k, o) => k -> o.length.toLong }
    val ex = ss.groupBy(_._3).map { case (k, o) => k -> o.length.toLong }
    val expected = (en.keySet ++ ex.keySet).map { ty =>
      val ne = en.getOrElse(ty, 0L)
      (ty, ne, ex.getOrElse(ty, 0L), ne * 10000 / tot)
    }
    val got = run("q_entry_exit").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._2).sum == tot)
    assert(got.toSeq.map(_._3).sum == tot)
  }
}
