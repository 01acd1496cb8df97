package graft

/** Round-8 §2.61 operator checks: PSI, Bhattacharyya, and tail ratios
  * against in-JVM brute force on the same pre/post split. */
class Round8ShiftSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def binned: Map[(String, Long), (Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type",
        "CAST(ts < TIMESTAMP '2024-01-16 00:00:00' AS BOOLEAN)",
        "CAST(round(value * 100) AS BIGINT) div 1000")
      .collect()
      .map(r => ((r.getString(0), r.getLong(2)), r.getBoolean(1)))
      .groupBy(_._1)
      .map { case (k, o) =>
        k -> (o.count(_._2).toLong, o.count(!_._2).toLong) }

  test("q_psi matches brute force and is non-negative") {
    val b = binned
    val expected = b.toSeq.groupBy(_._1._1).map { case (ty, bins) =>
      val tp = bins.map(_._2._1).sum
      val tq = bins.map(_._2._2).sum
      val bb = bins.size.toLong
      val (d1, d2) = (tp + bb, tq + bb)
      val (w1, w2) = bins.foldLeft((0L, 0L)) {
        case ((a1, a2), (_, (np, nq))) =>
          val (c1, c2) = (np + 1, nq + 1)
          val lr = math.round(math.log(
            (c1 * d2).toDouble / (c2 * d1)) * 1000000)
          (a1 + c1 * lr, a2 + c2 * lr)
      }
      val psi = ((w1 + 100000000L * d1) / d1 - 100000000L) -
        ((w2 + 100000000L * d2) / d2 - 100000000L)
      (ty, tp, tq, bb, psi)
    }.toSet
    val got = run("q_psi").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // PSI >= 0 up to quantization slack
    assert(got.forall(_._5 > -5))
  }

  test("q_bhattacharyya matches brute force and BC <= 1") {
    val b = binned
    val expected = b.toSeq.groupBy(_._1._1).map { case (ty, bins) =>
      val tp = bins.map(_._2._1).sum
      val tq = bins.map(_._2._2).sum
      val bb = bins.size.toLong
      val bc = bins.map { case (_, (np, nq)) =>
        math.round(math.sqrt(
          ((np + 1) * (nq + 1)).toDouble /
            ((tp + bb).toDouble * (tq + bb))) * 1000000)
      }.sum
      val bd = math.round(-math.log(bc.toDouble / 1000000) * 1000000)
      (ty, tp, tq, bb, bc, bd)
    }.toSet
    val got = run("q_bhattacharyya").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // BC in (0, 1] up to quantization; distance consistent sign
    assert(got.forall(r => r._5 > 0 && r._5 <= 1000005))
  }

  test("q_tail_ratio matches discrete percentiles") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (ty, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
      val (p50, p99) = (disc(50), disc(99))
      val ratio: Any = if (p50 == 0) null else p99 * 1000 / p50
      (ty, n, p50, p99, ratio)
    }.toSet
    val got = run("q_tail_ratio").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
  }
}
