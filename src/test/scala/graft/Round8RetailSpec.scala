package graft

/** Round-8 §2.68 operator checks: return rates, price dispersion, and
  * customer segment migration against in-JVM brute force. */
class Round8RetailSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_return_rates matches brute force and partitions lines") {
    val brand = ops.t(spark, sf, "part").select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_returnflag",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (brand(r.getLong(0)), r.getString(1),
        r.getLong(2)))
    val expected = li.groupBy(_._1).map { case (b, rs) =>
      val ret = rs.filter(_._2 == "R")
      (b, rs.length.toLong, ret.length.toLong,
        ret.length.toLong * 10000 / rs.length,
        rs.map(_._3).sum, ret.map(_._3).sum)
    }.toSet
    val got = run("q_return_rates").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._2).sum == li.length.toLong)
  }

  test("q_price_dispersion matches brute-force unit-price bounds") {
    val brand = ops.t(spark, sf, "part").select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "CAST(round(l_quantity) AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 > 0)
      .map(r => (brand(r._1), r._3 * 1000 / r._2))
    val expected = li.groupBy(_._1).map { case (b, rs) =>
      val (mn, mx) = (rs.map(_._2).min, rs.map(_._2).max)
      val sbp: Any = if (mn == 0) null else (mx - mn) * 10000 / mn
      (b, rs.length.toLong, mn, mx, mx - mn, sbp)
    }.toSet
    val got = run("q_price_dispersion").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) null else r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_customer_migration matrix partitions the customer union") {
    def seg(year: Int): Map[Long, Long] = {
      val sp = ops.t(spark, sf, "orders")
        .filter(s"o_orderdate >= TIMESTAMP '$year-01-01 00:00:00' AND " +
          s"o_orderdate < TIMESTAMP '${year + 1}-01-01 00:00:00'")
        .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).toSeq.map { case (ck, rs) => (ck, rs.map(_._2).sum) }
      val n = sp.length.toLong
      sp.sortBy(t => (t._2, t._1)).zipWithIndex.map { case ((ck, _), i) =>
        ck -> (i.toLong * 4 / n + 1) }.toMap
    }
    val (a, b) = (seg(1996), seg(1997))
    val expected = (a.keySet ++ b.keySet).toSeq
      .map(ck => (a.getOrElse(ck, 0L), b.getOrElse(ck, 0L)))
      .groupBy(identity).map { case (k, o) => (k._1, k._2, o.size.toLong) }
      .toSet
    val got = run("q_customer_migration").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._3).sum == (a.keySet ++ b.keySet).size.toLong)
    // segments live in 0..4
    assert(got.forall(r => r._1 >= 0 && r._1 <= 4 && r._2 >= 0 && r._2 <= 4))
  }
}
