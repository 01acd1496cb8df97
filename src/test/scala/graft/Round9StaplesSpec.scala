package graft

/** §2.93 staples: brute-force recounts at sf0.001 for the nth_value
  * window surface, the dup-band quality cross, and the Sharpe fold. */
class Round9StaplesSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_window_nth matches an in-memory window recount") {
    val rows = ops.t(spark, sf, "orders")
      .filter("o_orderkey < 500")
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (p, rs) =>
      val sorted = rs.sortBy(r => (-r._3, r._2)).toSeq
      val third: Option[Long] =
        if (sorted.length >= 3) Some(sorted(2)._3) else None
      sorted.zipWithIndex.take(25).map { case ((_, ok, c), i) =>
        (p, i + 1L) -> (ok, c, third,
          sorted.lift(i + 2).map(_._2),
          if (i >= 2) Some(sorted(i - 2)._2) else None)
      }
    }.toMap
    val got = run("q_window_nth").collect().map { r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))
    }.toMap
    assert(got == want,
      s"diff ${(got.toSet diff want.toSet).take(3)} vs " +
        s"${(want.toSet diff got.toSet).take(3)}")
    assert(got.nonEmpty && got.values.exists(_._3.isDefined))
  }

  test("q_dup_quality matches a hash-band recount") {
    val docs = ops.t(spark, sf, "documents")
      .selectExpr(
        "md5(concat_ws(' ', slice(split(lower(text), ' '), 1, 8)))",
        "n_chars", "size(split(lower(text), ' '))",
        "size(array_distinct(split(lower(text), ' ')))")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2).toLong, r.getInt(3).toLong))
    val gs = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = docs.groupBy { d =>
      val g = gs(d._1); if (g == 1) 0L else if (g <= 3) 1L else 2L
    }.map { case (b, rs) =>
      val n = rs.size.toLong
      b -> (n, rs.map(_._2).sum * 1000 / n,
        rs.map(d => d._4 * 10000 / d._3).sum / n)
    }
    val got = run("q_dup_quality").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    assert(got.size >= 2, "only one dup band — vacuous")
  }

  test("q_sharpe matches an in-memory moment fold") {
    val daily = ops.t(spark, sf, "orders")
      .selectExpr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).values.toSeq
    val n = daily.size.toLong
    val total = daily.sum
    val sq = daily.map(c => BigInt(c) * c).sum
    val varD = (sq.toDouble - total.toDouble * total / n) / n
    val sd = math.round(math.sqrt(varD))
    val sharpe = math.round(total.toDouble / n * 1000 / sd)
    val r = run("q_sharpe").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, total, total / n, sd, sharpe)))
    assert(sd > 0 && sharpe > 0)
  }
}
