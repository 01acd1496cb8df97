package graft

/** Round-8 §2.58 operator checks: Lorenz deciles, HHI, and CR-k
  * concentration ratios against in-JVM brute force. */
class Round8ConcentrationSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def custSpend: Seq[(Long, Long)] =
    ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, o) => (k, o.map(_._2).sum) }.toSeq

  test("q_lorenz matches brute-force decile cuts and is monotone") {
    val sp = custSpend.sortBy(t => (t._2, t._1))
    val n = sp.length.toLong
    val byDec = sp.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
    val tot = sp.map(_._2).sum
    var cum = 0L
    val expected = byDec.toSeq.sortBy(_._1).map { case (d, rs) =>
      val cents = rs.map(_._1._2).sum
      cum += cents
      (d, rs.length.toLong, cents, cents * 10000 / tot, cum * 10000 / tot)
    }.toSet
    val got = run("q_lorenz").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // Lorenz curve: decile shares are non-decreasing (sorted ascending)
    val shares = got.toSeq.sortBy(_._1).map(_._4)
    assert(shares == shares.sorted)
  }

  test("q_hhi matches brute force and is bounded by [1/k, 1]") {
    val supNation = ops.t(spark, sf, "supplier")
      .join(ops.t(spark, sf, "nation"),
        org.apache.spark.sql.functions.expr("s_nationkey = n_nationkey"))
      .select("s_suppkey", "n_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rev = ops.t(spark, sf, "lineitem")
      .selectExpr("l_suppkey", "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, o) => (k, o.map(_._2).sum) }
    val expected = rev.toSeq.groupBy { case (sk, _) => supNation(sk) }
      .map { case (nat, rs) =>
        val tot = rs.map(_._2).sum
        val ssq = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
        (nat, rs.length.toLong, tot,
          (ssq * 1000000 / (BigInt(tot) * BigInt(tot))).toLong)
      }.toSet
    val got = run("q_hhi").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    got.foreach { r =>
      assert(r._4 <= 1000000L && r._4 >= 1000000L / r._2 - 1)
    }
  }

  test("q_crk_share is internally consistent") {
    val rows = run("q_crk_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, cr1, cr4, cr8) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      // nested prefixes: CR1 <= CR4 <= CR8 <= 100%
      assert(cr1 <= cr4 && cr4 <= cr8 && cr8 <= 10000)
      // CR-k of k >= n brands is everything (floor-div slack 0)
      if (n <= 8) assert(cr8 == 10000 || cr8 == 9999)
      // top-1 of n brands holds at least 1/n of revenue
      assert(cr1 >= 10000 / n - 1)
    }
  }
}
