package graft

/** Round-7 §2.24 operator checks: in-JVM brute-force recomputation of the
  * report-twin / behavioral-analytics batch (TPC-H Q7/Q14/Q22 twins,
  * event-type precedence matrix, clickstream path trigrams, RFM
  * segmentation) — complementing the driver's DuckDB oracle with ground
  * truth derived from first principles on collected fixture rows. */
class Round7ReportsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Fixture key columns mix INT and BIGINT; widen uniformly. */
  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  /** SQL ntile semantics: the first (n mod k) buckets get one extra row. */
  private def ntileOf(idx: Int, n: Int, k: Int): Long = {
    val base = n / k; val rem = n % k
    if (idx < rem * (base + 1)) (idx / (base + 1) + 1).toLong
    else (rem + (idx - rem * (base + 1)) / base + 1).toLong
  }

  private lazy val events: Array[(Long, Long, Long, String)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_id", "unix_micros(ts)", "user_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  // --- q_tpch_q7 -------------------------------------------------------

  test("q_tpch_q7 matches brute-force cross-nation volume report") {
    val nation = ops.t(spark, sf, "nation").select("n_nationkey", "n_name")
      .collect().map(r => (lng(r, 0), r.getString(1))).toMap
    val supNat = ops.t(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey")
      .collect().map(r => (lng(r, 0), nation(lng(r, 1)))).toMap
    val custNat = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey")
      .collect().map(r => (lng(r, 0), nation(lng(r, 1)))).toMap
    val orderCust = ops.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .collect().map(r => (lng(r, 0), lng(r, 1))).toMap
    // exact decimal(15,2) × decimal(4,2) product as ×10000 integer units,
    // mirroring ops.discPrice (both factors carry ≤2 source dp)
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey", "year(l_shipdate)",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP))",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round((1 - l_discount) * 100) AS BIGINT)")
      .collect()
      .map(r => (lng(r, 0), lng(r, 1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    // dsumExact epilogue: exact decimal sum → nearest double → HALF_UP 2dp
    def rev(units: Long): Double = java.math.BigDecimal
      .valueOf(new java.math.BigDecimal(units).movePointLeft(4).doubleValue)
      .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = li
      .filter(l => l._4 >= lo && l._4 < hi)
      .map(l => (supNat(l._2), custNat(orderCust(l._1)), l._3.toLong, l._5))
      .filter(x => x._1 != x._2)
      .groupBy(x => (x._1, x._2, x._3))
      .map { case ((sn, cn, y), xs) =>
        (sn, cn, y, rev(xs.map(_._4).sum)) }
      .toSet
    val got = run("q_tpch_q7").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expected)
  }

  // --- q_tpch_q14 ------------------------------------------------------

  test("q_tpch_q14 matches brute-force promotion-share report") {
    val promo = ops.t(spark, sf, "part").select("p_partkey", "p_type")
      .collect().map(r => (lng(r, 0), r.getString(1) == "PROMO")).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "month(l_shipdate)", "unix_micros(CAST(l_shipdate AS TIMESTAMP))",
        "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)")
      .collect()
      .map(r => (lng(r, 0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val hi = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val expected = li
      .filter(l => l._3 >= lo && l._3 < hi)
      .groupBy(_._2)
      .map { case (mo, xs) =>
        val total = xs.map(_._4).sum
        val p = xs.filter(x => promo(x._1)).map(_._4).sum
        (mo.toLong, p, total, p * 10000L / total)
      }.toSet
    assert(expected.nonEmpty)
    val got = run("q_tpch_q14").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_tpch_q22 ------------------------------------------------------

  test("q_tpch_q22 matches brute-force lapsed high-balance report") {
    val cust = ops.t(spark, sf, "customer")
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(round(c_acctbal * 100) AS BIGINT)")
      .collect().map(r => (lng(r, 0), lng(r, 1), r.getLong(2)))
    val pos = cust.filter(_._3 > 0)
    val avgBal = (pos.map(_._3).sum / 100.0) / pos.length
    val cut = java.time.Instant.parse("1999-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val recent = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP))")
      .collect().filter(_.getLong(1) >= cut).map(r => lng(r, 0)).toSet
    val expected = cust
      .filter(c => c._3 / 100.0 > avgBal && !recent.contains(c._1))
      .groupBy(_._2)
      .map { case (nk, xs) =>
        (nk, xs.length.toLong,
          math.round(xs.map(_._3).sum / 100.0 * 100) / 100.0) }
      .toSet
    assert(expected.nonEmpty)
    val got = run("q_tpch_q22").collect()
      .map(r => (lng(r, 0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  // --- q_seq_pairs -----------------------------------------------------

  test("q_seq_pairs matches brute-force first-occurrence precedence") {
    val firsts = events.groupBy(e => (e._3, e._4))
      .map { case ((u, ty), xs) => (u, ty, xs.map(_._2).min) }.toSeq
    val byUser = firsts.groupBy(_._1)
    val expected = byUser.toSeq.flatMap { case (_, xs) =>
      for {
        a <- xs; b <- xs
        if a._2 != b._2
        if a._3 < b._3 || (a._3 == b._3 && a._2 < b._2)
      } yield (a._2, b._2, a._1)
    }.groupBy(x => (x._1, x._2))
      .map { case ((ta, tb), xs) =>
        (ta, tb, xs.map(_._3).distinct.size.toLong) }.toSet
    val got = run("q_seq_pairs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- q_path_trigrams -------------------------------------------------

  test("q_path_trigrams matches brute-force top-20 trigram count") {
    val tris = events.groupBy(_._3).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.toSeq.sortBy(e => (e._2, e._1)).map(_._4)
      ordered.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }
    val expected = tris.groupBy(identity)
      .map { case (tg, xs) => (tg, xs.size.toLong) }.toSeq
      .sortBy { case (tg, c) => (-c, tg) }.take(20).toSet
    assert(expected.size == 20)
    val got = run("q_path_trigrams").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  // --- q_rfm -----------------------------------------------------------

  test("q_rfm matches brute-force quintile grid") {
    val per = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (c, xs) =>
        (c, xs.map(_._2 / 86400000000L).max, xs.size.toLong,
          xs.map(_._3).sum) }.toSeq
    val maxDay = per.map(_._2).max
    val n = per.length
    def scores(ranked: Seq[Long]): Map[Long, Long] =
      ranked.zipWithIndex.map { case (c, i) => (c, ntileOf(i, n, 5)) }.toMap
    val r = scores(per.sortBy(p => (maxDay - p._2, p._1)).map(_._1))
    val f = scores(per.sortBy(p => (-p._3, p._1)).map(_._1))
    val m = scores(per.sortBy(p => (-p._4, p._1)).map(_._1))
    val expected = per.groupBy(p => (r(p._1), f(p._1), m(p._1)))
      .map { case ((rs, fs, ms), xs) =>
        (rs, fs, ms, xs.size.toLong, xs.map(_._4).sum) }.toSet
    val got = run("q_rfm").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSet
    assert(got == expected)
  }
}
