package graft

/** §2.86 privacy batch: in-memory brute force of the t-closeness EMD,
  * the width-risk curve's monotonicity, and suppression-cost roll-ups
  * at sf0.001. */
class Round9PrivacySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val cust: Seq[(Long, String, Long)] =
    ops.t(spark, sf, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(round(c_acctbal) AS BIGINT) div 1000")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("q_tcloseness matches brute-force ordered EMD") {
    val n = cust.size.toLong
    val bands = cust.map(_._3).distinct.sorted
    val glob = cust.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = cust.groupBy(c => (c._1, c._2)).map { case (gk, rs) =>
      val k = rs.size.toLong
      val cnt = rs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      var cumG = 0L; var cumA = 0L; var acc = 0L
      for (b <- bands) {
        cumG += cnt.getOrElse(b, 0L) * 10000 / k
        cumA += glob(b) * 10000 / n
        acc += math.abs(cumG - cumA)
      }
      gk -> (k, acc / (bands.size - 1))
    }
    val got = run("q_tcloseness").collect().map(r =>
      (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want,
      s"diff ${(got.toSet diff want.toSet).take(2)} vs " +
        s"${(want.toSet diff got.toSet).take(2)}")
    // discriminating: distances spread, and small groups tend worse
    assert(got.values.map(_._2).toSet.size > 3)
  }

  test("q_quasi_width: risk grows monotonically with width") {
    val rows = run("q_quasi_width").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // group counts and risk both non-decreasing in width
    assert(rows.map(_._2).sliding(2).forall(w => w(0) <= w(1)))
    assert(rows.map(_._5).sliding(2).forall(w => w(0) <= w(1)))
    // width-3 brute force
    val g3 = cust.groupBy(identity).values.map(_.size.toLong).toSeq
    assert(rows(2)._2 == g3.size.toLong)
    assert(rows(2)._3 == g3.count(_ == 1L).toLong)
    assert(rows(2)._4 == g3.filter(_ < 5).sum)
  }

  test("q_suppression_cost rolls up to the width-3 at-risk rows") {
    val rows = run("q_suppression_cost").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byNation = cust.groupBy(_._1)
    for ((nk, ng, gl, rl, nr, bp) <- rows) {
      val gs = byNation(nk).groupBy(c => (c._2, c._3)).values
        .map(_.size.toLong).toSeq
      assert(ng == gs.size.toLong)
      assert(gl == gs.count(_ < 5).toLong)
      assert(rl == gs.filter(_ < 5).sum)
      assert(nr == gs.sum)
      assert(bp == rl * 10000 / nr)
    }
    // total rows_lost equals the width-3 at-risk count from the curve
    val curve = run("q_quasi_width").collect()
      .find(_.getLong(0) == 3L).get.getLong(3)
    assert(rows.map(_._4).sum == curve)
  }
}
