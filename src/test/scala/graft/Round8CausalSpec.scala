package graft

import java.time.LocalDateTime

/** Round-8 §2.40 operator checks: in-JVM brute-force recomputation of
  * the CUPED / DiD / SRM / Cramér's V causal-measurement batch. */
class Round8CausalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private val cut = LocalDateTime.of(2024, 1, 16, 0, 0)

  /** (user, type, cents, epochDay, pre) rows of the events fixture. */
  private lazy val rows: Seq[(Long, String, Long, Long, Boolean)] =
    ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT)",
        "CAST(unix_micros(ts) AS BIGINT) div 86400000000", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getAs[java.sql.Timestamp](4).toLocalDateTime.isBefore(cut)))
      .toIndexedSeq

  test("q_cuped matches a brute-force CUPED computation") {
    val units = rows.groupBy(r => (r._1, r._2)).map { case ((u, tt), rs) =>
      val x = rs.filter(_._5).map(_._3 / 100).sum
      val y = rs.filterNot(_._5).map(_._3 / 100).sum
      (tt, u % 2 == 1, x, y)
    }.toSeq
    val expected = units.groupBy(_._1).map { case (tt, us) =>
      val n = us.size.toLong
      val sx = us.map(_._3).sum; val sy = us.map(_._4).sum
      val sxx = us.map(u => u._3 * u._3).sum
      val sxy = us.map(u => u._3 * u._4).sum
      val tr = us.filter(_._2); val ct = us.filterNot(_._2)
      val nt = tr.size.toLong
      val theta = (n * sxy - sx * sy) * 1000 / (n * sxx - sx * sx)
      val raw = tr.map(_._4).sum * 1000 / nt -
        ct.map(_._4).sum * 1000 / (n - nt)
      val dx = tr.map(_._3).sum * 1000 / nt -
        ct.map(_._3).sum * 1000 / (n - nt)
      (tt, n, nt, theta, raw, raw - theta * dx / 1000)
    }.toSet
    val got = run("q_cuped").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_did matches the four-cell brute force") {
    def cell(p: String => Boolean, pre: Boolean): (Long, Long) = {
      val rs = rows.filter(r => p(r._2) && r._5 == pre)
      (rs.size.toLong, rs.map(_._3).sum)
    }
    val (npv, spv) = cell(_ == "view", pre = true)
    val (npov, spov) = cell(_ == "view", pre = false)
    val expected = rows.map(_._2).distinct.filter(_ != "view").map { tt =>
      val (npt, spt) = cell(_ == tt, pre = true)
      val (npot, spot) = cell(_ == tt, pre = false)
      (tt, npt, npot, spt / npt, spot / npot, spv / npv, spov / npov,
        (spot / npot - spt / npt) - (spov / npov - spv / npv))
    }.toSet
    val got = run("q_did").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_srm chi-square matches brute force and flags sanely") {
    val byCell = rows.groupBy(r => (r._4, r._2)).map { case (k, rs) =>
      k -> rs.size.toLong }
    val tyN = byCell.groupBy(_._1._2).map { case (t, m) =>
      t -> m.values.sum }
    val g = tyN.values.sum
    val dayN = byCell.groupBy(_._1._1).map { case (d, m) =>
      d -> m.values.sum }
    val expected = byCell.groupBy(_._1._1).map { case (d, cells) =>
      val chi = cells.map { case ((_, ty), obs) =>
        val expM = dayN(d) * tyN(ty) * 1000 / g
        val dev = obs * 1000 - expM
        dev * dev / expM
      }.sum
      (d, dayN(d), chi, chi > 18467L)
    }.toSet
    val got = run("q_srm").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getBoolean(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // an A/A-shaped fixture must not flag every day
    assert(got.exists(!_._4))
  }

  test("q_cramers_v matches brute force and lands in [0, 1]") {
    val byCell = rows.groupBy(r => (r._2, (r._4 + 4) % 7))
      .map { case (k, rs) => k -> rs.size.toLong }
    val rN = byCell.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val cN = byCell.groupBy(_._1._2).map { case (d, m) => d -> m.values.sum }
    val n = rN.values.sum
    val chi = byCell.map { case ((ty, dw), obs) =>
      val expM = rN(ty) * cN(dw) * 1000 / n
      val dev = obs * 1000 - expM
      dev * dev / expM
    }.sum
    val v2 = chi * 10000 / (1000L * n * math.min(rN.size - 1, cN.size - 1))
    val got = run("q_cramers_v").collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (n, rN.size.toLong, cN.size.toLong, chi, v2))
    assert(v2 >= 0 && v2 <= 10000)
  }
}
