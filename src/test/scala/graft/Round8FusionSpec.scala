package graft

/** Round-8 §2.67 operator checks: RRF fusion, VWAP, and decay score
  * against in-JVM brute force. */
class Round8FusionSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_rrf fuses the two rankers with the exact weight table") {
    val vs = ops.t(spark, sf, "embeddings").selectExpr("vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val probes = vs.filter(_._1 < 20)
    val expected = probes.flatMap { case (pid, pe) =>
      val cands = vs.filter(_._1 != pid).map { case (cid, e) =>
        val dot = (0 until 64).map(i => pe(i) * e(i)).sum
        val cos = dot / math.sqrt(
          pe.map(x => x * x).sum * e.map(x => x * x).sum)
        (cid, cos, dot)
      }
      val ra = cands.sortBy(c => (-c._2, c._1)).map(_._1).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      val rb = cands.sortBy(c => (-c._3, c._1)).map(_._1).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      def w(r: Int): Long =
        if (r <= 10) graft.ops.Fusion.rrfWeights(r - 1) else 0L
      cands.map(c => (c._1, w(ra(c._1)) + w(rb(c._1))))
        .filter { case (cid, _) => ra(cid) <= 10 || rb(cid) <= 10 }
        .sortBy { case (cid, s) => (-s, cid) }.take(5).zipWithIndex
        .map { case ((cid, s), i) => (pid, i + 1L, cid, s) }
    }.toSet
    val got = run("q_rrf").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // fused score is bounded by twice the best single-run weight
    assert(got.forall(_._4 <= 2 * graft.ops.Fusion.rrfWeights.head))
  }

  test("q_vwap matches brute force and sits inside the price range") {
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr(
        "CAST(unix_micros(l_shipdate) div 86400000000 div 30 AS BIGINT)",
        "CAST(round(l_quantity) AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = li.groupBy(_._1).map { case (b, rs) =>
      val qty = rs.map(_._2).sum
      val pq = rs.map(r => r._3 * r._2).sum
      (b, rs.length.toLong, qty, pq, pq * 1000 / qty)
    }.toSet
    val got = run("q_vwap").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_decay_score matches brute force and ranks are contiguous") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT)",
        "19753 - unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scores = ev.groupBy(_._1).map { case (u, rs) =>
      val raw = rs.map(r => r._2 *
        math.round(math.pow(0.5, r._3.toDouble / 7.0) * 1000000)).sum
      (u, rs.length.toLong, raw / 1000000)
    }.toSeq
    val expected = scores.sortBy(s => (-s._3, s._1)).take(20).zipWithIndex
      .map { case ((u, n, sc), i) => (i + 1L, u, n, sc) }.toSet
    val got = run("q_decay_score").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._1).sorted == (1L to got.size).toSeq)
  }
}
