package graft

/** Round-8 §2.78 operator checks: single-source exposure, supplier
  * dependency, and cross-border share against in-JVM brute force. */
class Round8SupplySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_single_source matches brute force") {
    val brand = ops.t(spark, sf, "part").select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val perPart = li.groupBy(_._1).map { case (pk, rs) =>
      (brand(pk), rs.map(_._2).distinct.length, rs.map(_._3).sum) }
    val expected = perPart.groupBy(_._1).map { case (b, ps) =>
      val n = ps.size.toLong
      val ss = ps.count(_._2 == 1).toLong
      (b, n, ss, ss * 10000 / n,
        ps.filter(_._2 == 1).map(_._3).sum, ps.map(_._3).sum)
    }.toSet
    val got = run("q_single_source").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_supplier_dependency top brand dominates and bounds hold") {
    val rows = run("q_supplier_dependency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBrands, dep) = (r.getLong(1), r.getLong(4))
      // the top brand's share is at least the uniform share
      assert(dep >= 10000 / nBrands - 1 && dep <= 10000)
      assert(r.getBoolean(5) == (dep >= 5000))
    }
    // every supplier that ever shipped appears exactly once
    val nSupp = ops.t(spark, sf, "lineitem")
      .selectExpr("l_suppkey").distinct().count()
    assert(rows.length.toLong == nSupp)
  }

  test("q_cross_nation matches brute force") {
    val custGeo = ops.t(spark, sf, "customer")
      .join(ops.t(spark, sf, "nation"),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .join(ops.t(spark, sf, "region"),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG)", "r_name")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val orderGeo = ops.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> custGeo(r.getLong(1))).toMap
    val supNat = ops.t(spark, sf, "supplier")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS LONG)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map { r =>
        val (cn, region) = orderGeo(r.getLong(0))
        (region, supNat(r.getLong(1)) != cn, r.getLong(2))
      }
    val expected = li.groupBy(_._1).map { case (rg, rs) =>
      val cents = rs.map(_._3).sum
      val xb = rs.filter(_._2).map(_._3).sum
      (rg, rs.length.toLong, cents, xb, xb * 10000 / cents)
    }.toSet
    val got = run("q_cross_nation").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
