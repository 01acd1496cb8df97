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

  // --- q_tpch_q8 -------------------------------------------------------

  test("q_tpch_q8 matches brute-force market-share report") {
    val nation = ops.t(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (lng(r, 0), (r.getString(1), lng(r, 2)))).toMap
    val asia = ops.t(spark, sf, "region").collect()
      .collectFirst { case r if r.getString(1) == "ASIA" => lng(r, 0) }.get
    val std = ops.t(spark, sf, "part").select("p_partkey", "p_type")
      .collect().filter(_.getString(1) == "STANDARD")
      .map(r => lng(r, 0)).toSet
    val supNat = ops.t(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey")
      .collect().map(r => (lng(r, 0), nation(lng(r, 1))._1)).toMap
    val custNk = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey")
      .collect().map(r => (lng(r, 0), lng(r, 1))).toMap
    val lo = java.time.Instant.parse("1995-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val hi = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val ord = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        "year(o_orderdate)")
      .collect().filter(r => r.getLong(2) >= lo && r.getLong(2) < hi)
      .map(r => (lng(r, 0), (lng(r, 1), r.getInt(3).toLong))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round((1 - l_discount) * 100) AS BIGINT)")
      .collect().map(r => (lng(r, 0), lng(r, 1), lng(r, 2), r.getLong(3)))
    val per = li
      .filter(l => std(l._2) && ord.contains(l._1))
      .filter(l => nation(custNk(ord(l._1)._1))._2 == asia)
      .groupBy(l => (ord(l._1)._2, supNat(l._3)))
      .map { case ((y, sn), xs) => (y, sn, xs.map(_._4).sum) }.toSeq
    val yearTot = per.groupBy(_._1).map { case (y, xs) =>
      (y, xs.map(_._3).sum) }
    val expected = per.map { case (y, sn, v) =>
      (y, sn, v, v * 10000L / yearTot(y)) }.toSet
    val got = run("q_tpch_q8").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  // --- q_tpch_q9 -------------------------------------------------------

  test("q_tpch_q9 matches brute-force profit report (negatives exact)") {
    val nation = ops.t(spark, sf, "nation").select("n_nationkey", "n_name")
      .collect().map(r => (lng(r, 0), r.getString(1))).toMap
    val supNat = ops.t(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey")
      .collect().map(r => (lng(r, 0), nation(lng(r, 1)))).toMap
    val widget = ops.t(spark, sf, "part")
      .selectExpr("p_partkey", "p_name",
        "CAST(round(p_retailprice * 100) AS BIGINT)")
      .collect().filter(_.getString(1).contains("widget"))
      .map(r => (lng(r, 0), r.getLong(2))).toMap
    val ordYear = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate)")
      .collect().map(r => (lng(r, 0), r.getInt(1).toLong)).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey",
        "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round((1 - l_discount) * 100) AS BIGINT)")
      .collect()
      .map(r => (lng(r, 0), lng(r, 1), lng(r, 2), r.getLong(3),
        r.getLong(4)))
    // profit units (scale 4): discPrice units − retail_cents·qty·100
    val amounts = li
      .filter(l => widget.contains(l._2))
      .map(l => (supNat(l._3), ordYear(l._1),
        l._5 - widget(l._2) * l._4 * 100L))
    // group sums happen to stay positive on the fixture; the signed
    // arithmetic is still exercised per-row
    assert(amounts.exists(_._3 < 0), "fixture never exercises negatives")
    val expected = amounts
      .groupBy(x => (x._1, x._2))
      .map { case ((n, y), xs) => (n, y, xs.map(_._3).sum) }.toSet
    assert(expected.nonEmpty)
    val got = run("q_tpch_q9").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- q_tpch_q13 ------------------------------------------------------

  test("q_tpch_q13 matches brute-force distribution incl. zero bucket") {
    val custs = ops.t(spark, sf, "customer").select("c_custkey")
      .collect().map(r => lng(r, 0))
    val perCust = ops.t(spark, sf, "orders").select("o_custkey")
      .collect().map(r => lng(r, 0))
      .groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity)
      .map { case (k, xs) => (k, xs.size.toLong) }.toSet
    val got = run("q_tpch_q13").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  // --- q_tpch_q15 ------------------------------------------------------

  test("q_tpch_q15 matches brute-force top-supplier selection") {
    val names = ops.t(spark, sf, "supplier").select("s_suppkey", "s_name")
      .collect().map(r => (lng(r, 0), r.getString(1))).toMap
    val lo = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val hi = java.time.Instant.parse("1996-04-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val rev = ops.t(spark, sf, "lineitem")
      .selectExpr("l_suppkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP))",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round((1 - l_discount) * 100) AS BIGINT)")
      .collect().filter(r => r.getLong(1) >= lo && r.getLong(1) < hi)
      .map(r => (lng(r, 0), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx)
      .map { case (k, v) => (k, names(k), v) }.toSet
    val got = run("q_tpch_q15").collect()
      .map(r => (lng(r, 0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  // --- q_tpch_q16 ------------------------------------------------------

  test("q_tpch_q16 matches brute-force supplier-count report") {
    val sizes = Set(1L, 4L, 9L, 16L, 25L, 36L, 49L)
    val parts = ops.t(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .collect()
      .map(r => (lng(r, 0), (r.getString(1), r.getString(2), lng(r, 3))))
      .filter { case (_, (b, ty, sz)) =>
        b != "Brand#1" && !ty.startsWith("PROMO") && sizes(sz) }
      .toMap
    val expected = ops.t(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey")
      .collect().map(r => (lng(r, 0), lng(r, 1)))
      .filter(l => parts.contains(l._1))
      .map(l => (parts(l._1), l._2)).distinct
      .groupBy(_._1)
      .map { case ((b, ty, sz), xs) => (b, ty, sz, xs.length.toLong) }
      .toSet
    assert(expected.nonEmpty)
    val got = run("q_tpch_q16").collect()
      .map(r => (r.getString(0), r.getString(1), lng(r, 2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_tpch_q17 ------------------------------------------------------

  test("q_tpch_q17 matches brute-force small-quantity revenue") {
    val small = ops.t(spark, sf, "part").select("p_partkey", "p_type")
      .collect().filter(_.getString(1) == "SMALL").map(r => lng(r, 0)).toSet
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (lng(r, 0), r.getLong(1), r.getLong(2)))
      .filter(l => small(l._1))
    val pa = li.groupBy(_._1).map { case (k, xs) =>
      (k, (xs.map(_._2).sum, xs.length.toLong)) }
    val kept = li.filter { case (pk, qty, _) =>
      val (s, n) = pa(pk); 5L * qty * n < s }
    val revC = kept.map(_._3).sum
    val expected = Set((kept.length.toLong, revC, revC / 7L))
    assert(kept.nonEmpty)
    val got = run("q_tpch_q17").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
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
