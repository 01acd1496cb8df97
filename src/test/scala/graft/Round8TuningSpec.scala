package graft

/** Round-8 §2.73 operator checks: chunk sweep, watermark sweep, and
  * gap-hour profile against in-JVM brute force. */
class Round8TuningSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_chunk_sweep matches brute force and waste shrinks with size") {
    val toks = ops.t(spark, sf, "documents").select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    val expected = Seq(128L, 256L, 512L).map { c =>
      val chunks = toks.map(t => (t + c - 1) / c).sum
      val waste = chunks * c - toks.sum
      (c, toks.length.toLong, toks.sum, chunks, waste,
        waste * 10000 / (chunks * c))
    }.toSet
    val got = run("q_chunk_sweep").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected)
    // larger chunks waste MORE of the window on short docs
    val byChunk = got.toSeq.sortBy(_._1).map(_._6)
    assert(byChunk == byChunk.sorted)
  }

  test("q_watermark_sweep drops are monotone in the delay") {
    val rows = run("q_watermark_sweep").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length % 3 == 0)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byDelay = rs.sortBy(_._2).map(_._4).toSeq
      // a longer watermark never drops more
      assert(byDelay == byDelay.sorted.reverse)
      // all three delays see the same event count
      assert(rs.map(_._3).distinct.length == 1)
    }
  }

  test("q_gap_hours matches brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 3600000000")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val hs = rs.map(_._2).distinct.sorted
      val span = hs.last - hs.head + 1
      val maxGap =
        if (hs.length < 2) 0L
        else hs.zip(hs.tail).map { case (a, b) => b - a - 1 }.max
      (ty, span, hs.length.toLong, span - hs.length,
        (span - hs.length) * 10000 / span, maxGap)
    }.toSet
    val got = run("q_gap_hours").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
