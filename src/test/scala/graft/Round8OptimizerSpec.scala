package graft

/** Round-8 §2.81 operator checks: join-cardinality audit, selectivity
  * audit, and FD strength against in-JVM brute force. */
class Round8OptimizerSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_join_card_audit: actual equals the materialized join size") {
    val rows = run("q_join_card_audit").collect()
    assert(rows.length == 2)
    val actualOl = ops.t(spark, sf, "orders")
      .join(ops.t(spark, sf, "lineitem"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .count()
    val olRow = rows.find(_.getString(0) == "orders_lineitem").get
    assert(olRow.getLong(5) == actualOl)
    // FK joins: estimate = n1*n2/max(ndv); with unique parent keys the
    // estimate should be near-exact (every child row matches once)
    rows.foreach { r =>
      val (n1, n2, ndv, est, actual) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est == n1 * n2 / ndv)
      assert(r.getLong(6) == math.abs(est - actual) * 10000 / actual)
    }
  }

  test("q_selectivity_audit matches brute force") {
    val ds = ops.t(spark, sf, "lineitem")
      .selectExpr("unix_micros(l_shipdate) div 86400000000")
      .collect().map(_.getLong(0))
    val (n, lo, hi) = (ds.length.toLong, ds.min, ds.max)
    val expected = Seq(30L, 180L, 365L).map { w =>
      val actual = ds.count(d => d >= 9131L && d < 9131L + w).toLong
      val est = n * w / (hi - lo + 1)
      val err: Any =
        if (actual == 0) null else math.abs(est - actual) * 10000 / actual
      (w, n, actual, est, err)
    }.toSet
    val got = run("q_selectivity_audit").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_fd_strength matches brute force and is a valid share") {
    val os = ops.t(spark, sf, "orders")
      .selectExpr("o_orderstatus", "o_orderpriority",
        "CAST((unix_micros(o_orderdate) div 86400000000 + 3) % 7 + 1 " +
          "AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def fd(name: String, pairs: Seq[(String, String)]) = {
      val m = pairs.groupBy(identity).map { case (k, o) =>
        k -> o.length.toLong }
      val byA = m.groupBy(_._1._1)
      val explained = byA.values.map(_.values.max).sum
      val n = pairs.length.toLong
      (name, byA.size.toLong, n, explained, explained * 10000 / n)
    }
    val expected = Set(
      fd("status_to_priority", os.map(r => (r._1, r._2))),
      fd("priority_to_status", os.map(r => (r._2, r._1))),
      fd("status_to_dow", os.map(r => (r._1, r._3))))
    val got = run("q_fd_strength").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // a modal pick explains at least the uniform share, at most all
    assert(got.forall(r => r._5 <= 10000 && r._4 >= r._3 / 7))
  }
}
