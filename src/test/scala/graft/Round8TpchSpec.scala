package graft

/** Round-8 §2.49 operator checks: brute-force recomputation of the
  * last expressible TPC-H twins (Q1, Q4, Q6, Q19). */
class Round8TpchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** ×10000 integer units of discPrice (decimal(15,2) × decimal(4,2)),
    * the Round7ReportsSpec recipe. */
  private def disc10k(ext: Long, disc: Long): Long = ext * (100 - disc)

  private lazy val li: Array[(String, String, Long, Long, Long, Long, Long)] =
    ops.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "l_linestatus",
        "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)",
        "unix_micros(l_shipdate)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  private def us(date: String): Long =
    java.time.Instant.parse(date + "T00:00:00Z").getEpochSecond * 1000000L

  test("q_tpch_q1 matches brute-force pricing summary") {
    val cut = us("1998-09-02")
    val expected = li.filter(_._7 <= cut).groupBy(r => (r._1, r._2))
      .map { case ((rf, ls), rs) =>
        val n = rs.length.toLong
        val sumQty = rs.map(_._3).sum
        val base100 = rs.map(_._4).sum
        val disc10kSum = rs.map(r => disc10k(r._4, r._5)).sum
        val charge1M = rs.map(r => disc10k(r._4, r._5) * (100 + r._6)).sum
        def r2(x: BigDecimal): Double = x.setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        def r4(x: BigDecimal): Double = x.setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble
        (rf, ls, sumQty, r2(BigDecimal(base100) / 100),
          r2(BigDecimal(disc10kSum) / 10000),
          r2(BigDecimal(charge1M) / 1000000), n,
          r4(BigDecimal(sumQty) / n), r4(BigDecimal(base100) / 100 / n),
          r4(BigDecimal(rs.map(_._5).sum) / 100 / n))
      }.toSet
    val got = run("q_tpch_q1").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getLong(6), r.getDouble(7), r.getDouble(8),
      r.getDouble(9))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_tpch_q4 counts 1996-Q3 orders with a returned line") {
    val returned = ops.t(spark, sf, "lineitem")
      .filter("l_returnflag = 'R'").select("l_orderkey")
      .collect().map(_.getLong(0)).toSet
    val expected = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderpriority", "unix_micros(o_orderdate)")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(r => r._3 >= us("1996-07-01") && r._3 < us("1996-10-01")
        && returned(r._1))
      .groupBy(_._2).map { case (p, rs) => (p, rs.length.toLong) }.toSet
    val got = run("q_tpch_q4").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_tpch_q6 matches the brute-force revenue forecast") {
    val lo = us("1996-01-01"); val hi = us("1997-01-01")
    val rev10k = li.filter(r => r._7 >= lo && r._7 < hi &&
      r._5 >= 5 && r._5 <= 7 && r._3 < 24)
      .map(r => r._4 * r._5).sum
    val expected = BigDecimal(rev10k) / 10000
    val got = run("q_tpch_q6").collect()
    assert(got.length == 1)
    assert(BigDecimal(got.head.getDouble(0)) ==
      expected.setScale(2, BigDecimal.RoundingMode.HALF_UP))
  }

  test("q_tpch_q19 matches the brute-force three-band revenue") {
    val part = ops.t(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val rows = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .filter { case (pk, q, _, _) =>
        val (b, sz) = part(pk)
        (b == "Brand#1" && q >= 1 && q <= 11 && sz >= 1 && sz <= 5) ||
        (b == "Brand#13" && q >= 10 && q <= 20 && sz >= 1 && sz <= 10) ||
        (b == "Brand#20" && q >= 20 && q <= 30 && sz >= 1 && sz <= 15)
      }
    val expected = (rows.length.toLong,
      (BigDecimal(rows.map(r => disc10k(r._3, r._4)).sum) / 10000)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val got = run("q_tpch_q19").collect()
    assert(got.length == 1)
    assert((got.head.getLong(0), got.head.getDouble(1)) == expected)
    assert(expected._1 > 0)
  }
}
