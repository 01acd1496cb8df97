package graft

/** Round-8 §2.37 operator checks: in-JVM brute-force recomputation of
  * the survival / tail / corpus-growth / lang-audit batch. */
class Round8MeasureSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lnu(x: Double): Long =
    java.math.BigDecimal.valueOf(math.log(x) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private lazy val events: Array[(String, Long, Long, Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "event_id", "user_id",
        "CAST(unix_micros(ts) AS BIGINT)",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("q_survival matches brute-force Kaplan-Meier accounting") {
    val t0 = events.filter(_._1 == "signup").groupBy(_._3)
      .map { case (u, rs) => u -> rs.map(_._4).min }
    val hz = events.map(_._4).max
    val durs = t0.toSeq.map { case (u, start) =>
      val purch = events.filter(e =>
        e._1 == "purchase" && e._3 == u && e._4 >= start).map(_._4)
      if (purch.nonEmpty) ((purch.min - start) / 86400000000L, true)
      else ((hz - start) / 86400000000L, false)
    }
    val nTotal = durs.length.toLong
    val byDay = durs.groupBy(_._1).toSeq.sortBy(_._1)
    var seen = 0L
    var ls: Option[Long] = None
    val expected = byDay.map { case (day, rs) =>
      val d = rs.count(_._2).toLong
      val c = rs.count(!_._2).toLong
      val nRisk = nTotal - seen
      seen += d + c
      if (d > 0 && nRisk > d)
        ls = Some(ls.getOrElse(0L) + lnu((nRisk - d).toDouble / nRisk))
      (day, nRisk, d, c, ls)
    }.toSet
    val got = run("q_survival").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == expected)
    assert(expected.exists(_._5.exists(_ < 0)))
  }

  test("q_hill_tail matches brute-force order-statistic sums") {
    val expected = events.filter(_._5 > 0).groupBy(_._1)
      .flatMap { case (t, rs) =>
        val ordered = rs.sortBy(r => (-r._5, r._2)).map(_._5)
        if (ordered.length <= 101) None
        else {
          val ref = ordered(100)
          val sumU = ordered.take(100).map(x =>
            lnu(x.toDouble / ref)).sum
          Some((t, 100L, ref, sumU, sumU / 100))
        }
      }.toSet
    val got = run("q_hill_tail").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_heaps_law matches brute-force prefix vocabulary growth") {
    val docs = ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ", -1).filter(_.nonEmpty)))
      .sortBy(_._1)
    val nd = docs.length.toLong
    val expected = (1L to 10L).map { cp =>
      val bound = (nd * cp / 10).toInt
      val prefix = docs.take(bound)
      val nToks = prefix.map(_._2.length.toLong).sum
      val vocab = prefix.flatMap(_._2).distinct.length.toLong
      (cp, bound.toLong, nToks, vocab, lnu(nToks.toDouble),
        lnu(vocab.toDouble))
    }.toSet
    val got = run("q_heaps_law").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // vocabulary growth is sublinear on the fixture's bounded vocab:
    // last checkpoint's V/N well under the first's
    val byCp = expected.toSeq.sortBy(_._1)
    assert(byCp.last._4 * byCp.head._3 <= byCp.head._4 * byCp.last._3)
  }

  test("q_lang_confusion diagonal dominates and counts docs exactly") {
    val docs = ops.t(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1).filter(_.nonEmpty)))
    val all = docs.flatMap { case (_, l, ts) => ts.map((l, _)) }
    val cnt = all.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val tot = all.groupBy(_._1).map { case (l, v) => l -> v.length.toLong }
    val v = all.map(_._2).distinct.length.toLong
    val langs = tot.keys.toSeq.sorted
    val expected = docs.map { case (_, declared, ts) =>
      val byTok = ts.groupBy(identity).map { case (t, o) =>
        t -> o.length.toLong }
      val pred = langs.map { cand =>
        val score = byTok.map { case (tk, k) =>
          k * lnu((cnt.getOrElse((cand, tk), 0L) + 1.0) / (tot(cand) + v))
        }.sum
        (cand, score)
      }.minBy { case (c, sc) => (-sc, c) }._1
      (declared, pred)
    }.groupBy(identity).map { case ((d, p), o) =>
      (d, p, o.length.toLong) }.toSet
    val got = run("q_lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }
}
