package graft

/** Round-10 §2.99 batch: JVM brute-force twins for the distribution-
  * comparison close-out (Mood pivot + counts, the Brown–Forsythe
  * sums of squares in BigInt, Cochran's Q from a literal presence
  * matrix) and the Brier decomposition's internal identities. */
class Round10Batch5Spec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def orderCents(): Seq[(String, Long)] =
    ops.t(spark, sf, "orders")
      .selectExpr("o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Discrete p-th percentile: smallest v with cum·100 ≥ n·p. */
  private def disc(vs: Seq[Long], p: Int): Long = {
    val sorted = vs.sorted
    val n = sorted.size.toLong
    var cum = 0L
    for (v <- sorted) {
      cum += 1
      if (cum * 100 >= n * p) return v
    }
    sorted.last
  }

  test("q_median_test: pivot and per-priority counts match brute force") {
    val data = orderCents()
    val pivot = disc(data.map(_._2), 50)
    val expected = data.groupBy(_._1).map { case (g, xs) =>
      val n = xs.size.toLong
      val above = xs.count(_._2 > pivot).toLong
      (g, n, above, above * 10000 / n, pivot)
    }.toSet
    val got = run("q_median_test").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_levene: BigInt Brown–Forsythe sums match brute force") {
    val data = ops.t(spark, sf, "orders")
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val groups = data.groupBy(_._1).map { case (g, xs) =>
      val med = disc(xs.map(_._2), 50)
      val zs = xs.map(x => math.abs(x._2 - med))
      (g, zs.size.toLong, zs.map(BigInt(_)).sum,
        zs.map(z => BigInt(z) * z).sum)
    }.toSeq
    val k = groups.size.toLong
    val n = groups.map(_._2).sum
    val s = groups.map(_._3).sum
    val q = groups.map(_._4).sum
    val a = groups.map(g => (g._3 * g._3) / g._2).sum
    val ssb = (a - (s * s) / n).toLong
    val ssw = (q - a).toLong
    val w = math.round(ssb.toDouble * (n - k) * 1000 /
      (ssw.toDouble * (k - 1)))
    val row = run("q_levene").collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(row.getLong(2) == ssb, s"ssb ${row.getLong(2)} != $ssb")
    assert(row.getLong(3) == ssw, s"ssw ${row.getLong(3)} != $ssw")
    assert(row.getLong(4) == w)
  }

  test("q_cochran_q: presence-matrix Q matches brute force") {
    val pres = ops.t(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000",
        "event_type")
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val rTot = pres.groupBy(p => (p._1, p._2)).map(_._2.size.toLong).toSeq
    val cTot = pres.groupBy(_._3).map(_._2.size.toLong).toSeq
    val k = cTot.size.toLong
    val sumC = cTot.sum
    val sumC2 = cTot.map(c => c * c).sum
    val sumR = rTot.sum
    val sumR2 = rTot.map(r => r * r).sum
    val den = k * sumR - sumR2
    assert(den > 0, "fixture must exercise the non-degenerate branch")
    val qMilli = (k - 1) * (k * sumC2 - sumC * sumC) * 1000 / den
    val row = run("q_cochran_q").collect().head
    assert(row.getLong(0) == k && row.getLong(1) == rTot.size.toLong)
    assert(row.getLong(2) == sumC && row.getLong(3) == sumC2)
    assert(row.getLong(4) == sumR && row.getLong(5) == sumR2)
    assert(row.getLong(6) == qMilli)
  }

  test("q_brier_decomp: identities hold and terms recompute from the row") {
    val rows = run("q_brier_decomp").collect()
    val nEmb = ops.t(spark, sf, "embeddings").count()
    val nPos = ops.t(spark, sf, "embeddings")
      .filter("label >= 5").count()
    assert(rows.map(_.getLong(1)).sum == nEmb)
    val ybarAll = rows.map(_.getLong(4)).distinct
    assert(ybarAll.length == 1 &&
      ybarAll.head == nPos * 10000 / nEmb)
    for (r <- rows) {
      val (bin, n, pbar, ybar) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bin >= 0 && bin <= 9)
      assert(pbar >= 0 && pbar <= 10000 && ybar >= 0 && ybar <= 10000)
      assert(r.getLong(5) == n * (pbar - ybar) * (pbar - ybar))
      assert(r.getLong(6) ==
        n * (ybar - ybarAll.head) * (ybar - ybarAll.head))
      // a forecast bin's mean must sit inside the bin it was floored to
      assert(pbar / 1000 == bin || (bin == 9 && pbar >= 9000))
    }
  }

  /** The shared md5-sign plane (Evaluation.mdSigns twin). */
  private def signs(j: Int): Array[Double] = Array.tabulate(64) { i =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(String.valueOf(j * 64 + i).getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  test("q_mcnemar: discordant cells match a JVM rescore") {
    val emb = ops.t(spark, sf, "embeddings").collect().map { r =>
      (r.getInt(2) >= 5, r.getSeq[Float](1).map(_.toDouble).toArray)
    }
    val (sa, sb) = (signs(104), signs(105))
    def dot(e: Array[Double], s: Array[Double]) =
      e.indices.map(i => e(i) * s(i)).sum
    var (both, b, c, neither) = (0L, 0L, 0L, 0L)
    for ((pos, e) <- emb) {
      val ra = (dot(e, sa) > 0) == pos
      val rb = (dot(e, sb) > 0) == pos
      if (ra && rb) both += 1
      else if (ra && !rb) b += 1
      else if (!ra && rb) c += 1
      else neither += 1
    }
    val row = run("q_mcnemar").collect().head
    assert(row.getLong(0) == emb.length.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((both, b, c, neither)))
    if (b + c > 0)
      assert(row.getLong(5) == (b - c) * (b - c) * 1000 / (b + c))
  }

  test("q_jarque_bera: BigInt central sums match brute force") {
    val data = ops.t(spark, sf, "orders")
      .selectExpr("o_orderpriority", "CAST(round(o_totalprice) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = data.groupBy(_._1).map { case (g, xs) =>
      val n = xs.size.toLong
      val mean = xs.map(_._2).sum / n
      val ds = xs.map(_._2 - mean)
      val m2 = ds.map(d => BigInt(d) * d).sum
      val m3 = ds.map(d => BigInt(d) * d * d).sum
      val m4 = ds.map(d => BigInt(d) * d * d * d).sum
      val skew = math.round(m3.toDouble * math.sqrt(n.toDouble) * 1000 /
        math.sqrt(m2.toDouble * m2.toDouble * m2.toDouble))
      val kurt = math.round(
        (m4.toDouble * n / (m2.toDouble * m2.toDouble) - 3.0) * 1000)
      val jb = math.round(n * (skew.toDouble / 1000 * (skew.toDouble / 1000)
        + kurt.toDouble / 1000 * (kurt.toDouble / 1000) / 4) / 6 * 1000)
      (g, n, mean, skew, kurt, jb)
    }.toSet
    val got = run("q_jarque_bera").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  test("q_poisson_dispersion: BigInt index matches brute force") {
    val counts = ops.t(spark, sf, "events")
      .selectExpr("event_type", "user_id",
        "unix_micros(ts) div 86400000000")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).toSeq
      .map { case (k, v) => (k._1, v.size.toLong) }
    val expected = counts.groupBy(_._1).map { case (t, cs) =>
      val n = cs.size.toLong
      val s = cs.map(_._2).sum
      val q = cs.map(c => c._2 * c._2).sum
      val mean = BigInt(s) * 1000 / n
      val disp = (BigInt(n) * q - BigInt(s) * s) * 1000 /
        (BigInt(n - 1) * s)
      (t, n, s, mean.toLong, disp.toLong)
    }.toSet
    val got = run("q_poisson_dispersion").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_chebyshev_coverage: exact inequality matches brute force") {
    val data = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = data.groupBy(_._1).map { case (t, xs) =>
      val n = xs.size.toLong
      val s = xs.map(x => BigInt(x._2)).sum
      val q = xs.map(x => BigInt(x._2) * x._2).sum
      val den = BigInt(n) * q - s * s
      def within(k: Int) = xs.count { x =>
        val num = BigInt(n) * x._2 - s
        num * num <= den * k * k
      }.toLong
      val (w1, w2, w3) = (within(1), within(2), within(3))
      (t, n, w1, w2, w3, w1 * 10000 / n, w2 * 10000 / n, w3 * 10000 / n)
    }.toSet
    val got = run("q_chebyshev_coverage").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected)
    // Chebyshev's floor must hold: coverage at k≥2 is ≥ 1 − 1/k²
    for ((_, n, _, w2, w3, _, _, _) <- got) {
      assert(w2 * 4 >= 3 * n && w3 * 9 >= 8 * n)
    }
  }

  test("q_kruskal_wallis: midrank sums and H match brute force") {
    val data = orderCents()
    val n = data.size.toLong
    // tie-averaged ×2 midranks over the pooled sorted sample
    val hist = data.map(_._2).groupBy(identity).toSeq
      .map { case (v, xs) => (v, xs.size.toLong) }.sortBy(_._1)
    var cum = 0L
    val avg2 = hist.map { case (v, c) =>
      val a = 2 * cum + c + 1; cum += c; (v, a)
    }.toMap
    val groups = data.groupBy(_._1).map { case (_, xs) =>
      val nG = xs.size.toLong
      val r2 = xs.map(x => BigInt(avg2(x._2))).sum
      (nG, r2)
    }.toSeq
    val k = groups.size.toLong
    val sumRq = groups.map { case (nG, r2) => r2 * r2 / (4 * nG) }
      .sum.toLong
    val tieNum = hist.map { case (_, c) => BigInt(c) * c * c - c }
      .sum.toLong
    val h = math.round((12.0 * sumRq / (n.toDouble * (n + 1)) -
      3.0 * (n + 1)) /
      (1.0 - tieNum.toDouble / (n.toDouble * n * n - n)) * 1000)
    val row = run("q_kruskal_wallis").collect().head
    assert(row.getLong(0) == k && row.getLong(1) == n)
    assert(row.getLong(2) == sumRq, s"sum_rq ${row.getLong(2)} != $sumRq")
    assert(row.getLong(3) == tieNum)
    assert(row.getLong(4) == h)
  }

  test("q_theil_sen: pairwise median slope matches brute force") {
    val daily = ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(p => (p._1, p._2)).toSeq
      .map { case ((t, d), xs) => (t, d, xs.map(_._3).sum) }
    val expected = daily.groupBy(_._1).map { case (t, ds) =>
      val pts = ds.sortBy(_._2)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.size
      } yield {
        val num = (pts(j)._3 - pts(i)._3) * 1000
        val den = pts(j)._2 - pts(i)._2
        num / den  // JVM / truncates toward zero like Spark div
      }).sorted
      val n = slopes.size.toLong
      val med = slopes((((n + 1) / 2) - 1).toInt)
      (t, pts.size.toLong, n, med)
    }.toSet
    val got = run("q_theil_sen").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }
}
