package graft

/** Round-8 §2.82 operator checks: weekend effect, mix-shift
  * decomposition, and heat grid against in-JVM brute force. */
class Round8SeasonalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_weekend_effect matches brute force") {
    val seg = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val os = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey",
        "CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (seg(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val expected = os.groupBy(_._1).map { case (sg, rs) =>
      val (we, wd) = rs.partition(r => (r._2 + 3) % 7 + 1 >= 6)
      val wdD = wd.map(_._2).distinct.length.toLong
      val weD = we.map(_._2).distinct.length.toLong
      val wdC = wd.map(_._3).sum
      val weC = we.map(_._3).sum
      val wdR: Any = if (wdD == 0) null else wdC * 1000 / wdD
      val weR: Any = if (weD == 0) null else weC * 1000 / weD
      val lift: Any =
        if (wdD == 0 || weD == 0 || wdC * 1000 / wdD == 0) null
        else {
          val den = wdC * 1000 / wdD
          ((weC * 1000 / weD - den) * 10000 + 10001 * den) / den - 10001
        }
      (sg, wdD, weD, wdC, weC, wdR, weR, lift)
    }.toSet
    def nl(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getLong(i)
    val got = run("q_weekend_effect").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      nl(r, 5), nl(r, 6), nl(r, 7))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_mix_shift identity holds exactly") {
    val rows = run("q_mix_shift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, ra, rb) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      val (rateE, mixE) = (r.getLong(5), r.getLong(6))
      // decomposition structure
      assert(rateE == (rb - ra) * na)
      assert(mixE == (nb - na) * rb)
      // the residual is bounded by the two floor-division remainders
      assert(math.abs(r.getLong(7)) <= na + nb)
    }
  }

  test("q_heat_grid matches brute force and partitions events") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("(unix_micros(ts) div 86400000000 + 3) % 7 + 1",
        "(unix_micros(ts) div 3600000000) % 24")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tot = ev.length.toLong
    val expected = ev.groupBy(identity).map { case ((d, h), o) =>
      (d, h, o.length.toLong, o.length.toLong * 10000 / tot) }.toSet
    val got = run("q_heat_grid").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._3).sum == tot)
    assert(got.forall(r => r._1 >= 1 && r._1 <= 7 && r._2 >= 0 &&
      r._2 <= 23))
  }
}
