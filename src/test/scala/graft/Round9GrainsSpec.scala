package graft

/** §2.90 warehouse staples: brute-force twins at sf0.001 — grouping-set
  * recount for the time rollup, direct distinct counting for the PK
  * audit, and a sequential percentile/tail recount. */
class Round9GrainsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_time_grain_rollup matches an explicit grouping-set recount") {
    val rows = ops.t(spark, sf, "orders")
      .selectExpr("CAST(year(o_orderdate) AS BIGINT)",
        "CAST(quarter(o_orderdate) AS BIGINT)",
        "CAST(month(o_orderdate) AS BIGINT)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def fold(key: ((Long, Long, Long, Long)) => (Long, Long, Long)) =
      rows.groupBy(key).map { case (k, rs) =>
        k -> (rs.size.toLong, rs.map(_._4).sum)
      }
    val want =
      fold(r => (r._1, r._2, r._3)) ++
        fold(r => (r._1, r._2, -1L)) ++
        fold(r => (r._1, -1L, -1L)) ++
        fold(_ => (-1L, -1L, -1L))
    val got = run("q_time_grain_rollup").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == want,
      s"diff ${(got.toSet diff want.toSet).take(3)} vs " +
        s"${(want.toSet diff got.toSet).take(3)}")
    // all four grouping levels present
    assert(got.contains((-1L, -1L, -1L)))
    assert(got.keys.exists(k => k._2 == -1L && k._1 != -1L))
    assert(got.keys.exists(k => k._3 == -1L && k._2 != -1L))
  }

  test("q_pk_audit: singular keys unique; lineitem dup count exact") {
    val got = run("q_pk_audit").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("orders", "customer", "part", "supplier",
      "events", "lineitem"))
    for ((t, (rows, keys, dups)) <- got) {
      assert(rows == ops.t(spark, sf, t).count(), s"$t row count")
      if (t != "lineitem")
        assert(rows == keys && dups == 0L, s"$t has duplicate keys")
    }
    // the audit's actual catch: the synthetic fixture does NOT enforce
    // TPC-H's (l_orderkey, l_linenumber) composite PK — recount it
    val want = ops.t(spark, sf, "lineitem")
      .selectExpr("concat(l_orderkey, ':', l_linenumber)")
      .collect().map(_.getString(0))
    val (rows, keys, dups) = got("lineitem")
    assert(keys == want.distinct.length.toLong)
    assert(dups == rows - keys && dups > 0L,
      "fixture lineitem unexpectedly became PK-clean — update this spec")
  }

  test("q_tail_mass matches a sequential percentile/tail recount") {
    val evs = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val vals = rs.map(_._2).sorted
      val n = vals.length.toLong
      val total = vals.sum
      def pick(p: Int): Long = {
        // smallest value whose cumulative count reaches p% (disc)
        var cum = 0L
        vals.find { v => cum += 1; cum * 100 >= n * p }.get
      }
      val (p50, p90, p99) = (pick(50), pick(90), pick(99))
      def above(thr: Long) = vals.filter(_ > thr).sum * 10000 / total
      t -> (n, total, p50, p90, p99, above(p50), above(p90), above(p99))
    }
    val got = run("q_tail_mass").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toMap
    assert(got == want, s"$got vs $want")
    // the tail must concentrate: p99 mass share well below p50's
    assert(got.values.forall(v => v._8 < v._6))
  }
}
