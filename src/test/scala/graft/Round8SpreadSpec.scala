package graft

/** Round-8 §2.59 operator checks: one-way ANOVA, Tukey fences, and
  * Bowley skewness against in-JVM brute force. */
class Round8SpreadSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_anova matches brute-force micro-unit sums of squares") {
    val docs = ops.t(spark, sf, "documents").select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val gs = docs.groupBy(_._1).map { case (_, rs) =>
      (rs.length.toLong, rs.map(_._2).sum, rs.map(x => x._2 * x._2).sum)
    }.toSeq
    val k = gs.length.toLong
    val n = gs.map(_._1).sum
    val sTot = gs.map(_._2).sum
    val q = gs.map(_._3).sum
    val aU = gs.map(g => (BigInt(g._2) * g._2 * 1000000 / g._1).toLong).sum
    val ssbU = aU - (BigInt(sTot) * sTot * 1000000 / n).toLong
    val sswU = q * 1000000 - aU
    val fMilli = math.round(ssbU.toDouble * (n - k) * 1000 /
      (sswU.toDouble * (k - 1)))
    val r = run("q_anova").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((k, n, ssbU, sswU, fMilli)))
    // variance decomposition: both components non-negative
    assert(ssbU >= 0 && sswU >= 0)
  }

  test("q_tukey_fences quartiles and outlier counts match brute force") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      val (q1, q3) = (disc(25), disc(75))
      val lo = q1 - Math.floorDiv(3 * (q3 - q1), 2)
      val hi = q3 + Math.floorDiv(3 * (q3 - q1), 2)
      (ty, n, q1, q3, lo, hi,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong)
    }.toSet
    val got = run("q_tukey_fences").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_bowley_skew matches brute force and is bounded") {
    val docs = ops.t(spark, sf, "documents").select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      val (q1, q2, q3) = (disc(25), disc(50), disc(75))
      val b: Any = if (q3 == q1) null
      else ((q1 + q3 - 2 * q2) * 1000 + 1001 * (q3 - q1)) /
        (q3 - q1) - 1001
      (src, q1, q2, q3, b)
    }.toSet
    val got = run("q_bowley_skew").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    got.foreach { r =>
      if (r._5 != null) {
        val b = r._5.asInstanceOf[Long]
        assert(b >= -1000 && b <= 1000)
      }
    }
  }
}
