package graft

/** Round-8 §2.56 operator checks: Simpson diversity, source-novelty JSD,
  * and categorical mutual information against in-JVM brute force. */
class Round8DiversitySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def sourceTokenCounts: Map[(String, String), Long] =
    ops.t(spark, sf, "documents").select("source", "text")
      .collect().flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(tk => (r.getString(0), tk)))
      .groupBy(identity).map { case (k, o) => k -> o.length.toLong }

  test("q_simpson matches exact integer collision arithmetic") {
    val counts = sourceTokenCounts
    // BigInt mirrors the DECIMAL(38,0)/HUGEINT promotion; the guards
    // mirror the degenerate-source NULLs (no such source exists in the
    // fixture — asserted below — so the Long getters stay safe)
    val expected = counts.toSeq.groupBy(_._1._1).map { case (src, ts) =>
      val n = ts.map(_._2).sum
      val coll = ts.map(c => c._2 * (c._2 - 1)).sum
      assert(n >= 2 && coll > 0, s"fixture source $src degenerated")
      (src, ts.size.toLong, n, coll,
        (BigInt(coll) * 1000000000L / (BigInt(n) * (n - 1))).toLong,
        (BigInt(n) * (n - 1) * 1000L / coll).toLong)
    }.toSet
    val got = run("q_simpson").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // λ is a probability: 0 < λ < 1 in ppb.
    assert(got.forall(r => r._5 > 0 && r._5 < 1000000000L))
  }

  test("q_jsd_sources matches brute-force quantized JSD and is bounded") {
    val counts = sourceTokenCounts
    val ct = counts.toSeq.groupBy(_._1._2)
      .map { case (tk, o) => tk -> o.map(_._2).sum }
    val ns = counts.toSeq.groupBy(_._1._1)
      .map { case (sc, o) => sc -> o.map(_._2).sum }
    val nn = ct.values.sum
    val vv = ct.size.toLong
    val expected = ns.map { case (src, nS) =>
      val d1 = nS + vv
      val d2 = nn - nS + vv
      val (w1, w2) = ct.foldLeft((0L, 0L)) { case ((a1, a2), (tk, cT)) =>
        val cSt = counts.getOrElse((src, tk), 0L)
        val c1 = cSt + 1
        val c2 = cT - cSt + 1
        val den = (c1 * d2 + c2 * d1).toDouble
        val lr1 = math.round(math.log(2.0 * c1 * d2 / den) * 1000000)
        val lr2 = math.round(math.log(2.0 * c2 * d1 / den) * 1000000)
        (a1 + c1 * lr1, a2 + c2 * lr2)
      }
      (src, nS, ((w1 + d1) / d1 + (w2 + d2) / d2) / 2 - 1)
    }.toSet
    val got = run("q_jsd_sources").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && expected.nonEmpty)
    // JSD is bounded by ln 2 (693147 µnats) and non-negative up to
    // quantization slack.
    assert(got.forall(r => r._3 > -5 && r._3 < 693147L))
  }

  test("q_mutual_info matches brute force and MI <= H(type)") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "(unix_micros(ts) div 3600000000) % 24")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cell = ev.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val mx = ev.groupBy(_._1).map { case (k, o) => k -> o.length.toLong }
    val my = ev.groupBy(_._2).map { case (k, o) => k -> o.length.toLong }
    val nn = ev.length.toLong
    val wsum = cell.map { case ((x, y), nXy) =>
      nXy * math.round(math.log(
        nXy.toDouble * nn / (mx(x).toDouble * my(y))) * 1000000)
    }.sum
    val hsum = mx.values.map(nX =>
      nX * math.round(math.log(nn.toDouble / nX) * 1000000)).sum
    val expected = (cell.size.toLong, nn,
      (wsum + nn) / nn - 1, Math.floorDiv(hsum, nn))
    val rows = run("q_mutual_info").collect()
    assert(rows.length == 1)
    val r = rows.head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(got == expected)
    // 0 <= MI <= H(type) up to quantization slack.
    assert(got._3 > -5 && got._3 <= got._4 + 5)
  }
}
