package graft

/** Round-8 §2.51 operator checks: in-JVM brute-force recomputation of
  * the QQ-decile grid, ABC classification, and price-volume-mix. */
class Round8BridgeSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_qq_deciles matches brute-force discrete deciles") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def disc(rs: Seq[Long], d: Long): Long = {
      val sorted = rs.sorted; val n = sorted.length.toLong
      sorted(((n * d + 99) / 100 - 1).toInt)
    }
    val byType = ev.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).toSeq }
    val expected = (for {
      (t, rs) <- byType.toSeq if t != "view"
      d <- (1 to 9).map(_ * 10L)
      qt = disc(rs, d); qv = disc(byType("view"), d)
    } yield (t, d, qt, qv, qt - qv)).toSet
    val got = run("q_qq_deciles").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_abc_class matches brute force and partitions all parts") {
    val rev = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
          "CAST(round((1 - l_discount) * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, rs) => (k, rs.map(_._2).sum) }.toSeq
    val tot = rev.map(_._2).sum
    var cum = 0L
    val classed = rev.sortBy { case (k, v) => (-v, k) }.map { case (_, v) =>
      val cls = if (cum * 5 < tot * 4) "A"
        else if (cum * 20 < tot * 19) "B" else "C"
      cum += v; (cls, v)
    }
    val expected = classed.groupBy(_._1).map { case (c, rs) =>
      (c, rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._2).sum * 10000 / tot)
    }.toSet
    val got = run("q_abc_class").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // partition: class part counts sum to the distinct part count
    assert(got.toSeq.map(_._2).sum == rev.length.toLong)
  }

  test("q_price_volume_mix bridge identity holds exactly") {
    val got = run("q_price_volume_mix").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)))
    assert(got.nonEmpty)
    // the decomposition identity is exact by construction of the residual
    assert(got.forall { case (_, r1, r2, ve, pe, res) =>
      r2 - r1 == ve + pe + res })
    // the truncation residual must stay small relative to the delta:
    // |resid| < q2 (one unit of price truncation per unit sold) — here
    // bounded loosely by rev2
    assert(got.forall { case (_, _, r2, _, _, res) =>
      math.abs(res) <= r2 })
  }
}
