package graft

/** Round-8 §2.63 operator checks: discount lift, inter-purchase gaps,
  * and day-of-week profile against in-JVM brute force. */
class Round8CommerceSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_discount_lift bands partition the fact table") {
    val rows = run("q_discount_lift").collect()
    assert(rows.nonEmpty)
    val nTot = ops.t(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == nTot)
    rows.foreach { r =>
      // net revenue never exceeds gross, and bands are rates 0..10%
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
    }
    // the zero-discount band (if present) has net == gross
    rows.filter(_.getLong(0) == 0L)
      .foreach(r => assert(r.getLong(4) == r.getLong(3)))
  }

  test("q_interpurchase matches brute-force discrete gap percentiles") {
    val seg = ops.t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val os = ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = os.groupBy(_._1).toSeq.flatMap { case (ck, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).toList
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        (seg(ck), b._3 - a._3)
      }
    }
    val expected = gaps.groupBy(_._1).map { case (sg, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      (sg, n, disc(50), disc(90))
    }.toSet
    val got = run("q_interpurchase").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_dow_profile matches brute force and covers the week") {
    val os = ops.t(spark, sf, "orders")
      .selectExpr("CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => ((r.getLong(0) + 3) % 7 + 1, r.getLong(1)))
    val tot = os.map(_._2).sum
    val expected = os.groupBy(_._1).map { case (dow, rs) =>
      val cents = rs.map(_._2).sum
      (dow, rs.length.toLong, cents, cents * 10000 / tot)
    }.toSet
    val got = run("q_dow_profile").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.size == 7)
    assert(got.forall(r => r._1 >= 1 && r._1 <= 7))
  }
}
