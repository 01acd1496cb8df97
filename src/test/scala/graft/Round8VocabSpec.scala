package graft

/** Round-8 §2.55 operator checks: hapax profile, behavioral venn, and
  * doc-length percentiles against in-JVM brute force. */
class Round8VocabSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_hapax matches the brute-force vocabulary profile") {
    val counts = ops.t(spark, sf, "documents").select("source", "text")
      .collect().flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(tk => (r.getString(0), tk)))
      .groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val expected = counts.toSeq.groupBy(_._1._1).map { case (src, ts) =>
      val vocab = ts.size.toLong
      val hapax = ts.count(_._2 == 1L).toLong
      (src, vocab, hapax, ts.count(_._2 == 2L).toLong,
        ts.map(_._2).sum, hapax * 10000 / vocab)
    }.toSet
    val got = run("q_hapax").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_venn3 regions partition the user base") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT)",
        "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val expected = ev.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.map(_._3).sum > 330000L,
        rs.map(_._4).distinct.length >= 28,
        rs.count(_._2 == "purchase") >= 13)
    }.groupBy(identity).map { case ((a, b, c), o) =>
      (a, b, c, o.size.toLong) }.toSet
    val got = run("q_venn3").collect().map(r => (r.getBoolean(0),
      r.getBoolean(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // regions are non-degenerate (more than one populated) and partition
    assert(got.size > 1)
    assert(got.toSeq.map(_._4).sum == ev.map(_._1).distinct.length.toLong)
  }

  test("q_doclen_disc picks the smallest length reaching p") {
    val docs = ops.t(spark, sf, "documents").select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      (src, n, disc(50), disc(90), disc(99))
    }.toSet
    val got = run("q_doclen_disc").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
