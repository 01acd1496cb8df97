package graft

/** Round-7 §2.27 operator checks: in-JVM brute-force recomputation of
  * the storage/BI/audit batch (zone maps, cosine histogram, CV folds,
  * Wilson CTR, Pareto concentration, Benford audit, seasonality) —
  * complementing the driver's DuckDB oracle with ground truth derived
  * from first principles on collected fixture rows. */
class Round7InsightsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val orders: Array[(Long, Long, Long, Long, String)] =
    ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000",
        "CAST(round(o_totalprice * 100) AS BIGINT)", "o_orderstatus")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))

  private lazy val dailyCents: Map[(String, Long), Long] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }

  // --- q_zone_map ------------------------------------------------------

  test("q_zone_map matches brute-force block stats") {
    val expected = orders.groupBy(_._1 / 256).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._3).min, xs.map(_._3).max,
        xs.map(_._4).min, xs.map(_._4).max) }.toSet
    assert(expected.size > 1)
    val got = run("q_zone_map").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  // --- q_sim_histogram -------------------------------------------------

  test("q_sim_histogram matches JVM cosine binning") {
    val vecs = ops.t(spark, sf, "embeddings")
      .filter("vec_id < 200").select("vec_id", "embedding")
      .collect()
      .map(r => (lng(r, 0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val cos = for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
    } yield dot(va, vb) / math.sqrt(dot(va, va) * dot(vb, vb))
    val expected = cos.groupBy(c => math.floor(c * 10).toLong)
      .map { case (b, xs) =>
        (b, xs.length.toLong, r4(xs.min), r4(xs.max)) }.toSet
    assert(expected.size > 1)
    val got = run("q_sim_histogram").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == expected)
  }

  // --- q_cv_folds ------------------------------------------------------

  test("q_cv_folds matches JVM md5 fold assignment") {
    val fold = ops.t(spark, sf, "customer").select("c_custkey")
      .collect().map(r => lng(r, 0))
      .map(ck => (ck,
        java.lang.Long.parseLong(md5hex(ck + ":cv").take(6), 16) % 5))
      .toMap
    val joined = orders.map(o => (fold(o._2), o._2, o._4))
    val total = joined.map(_._3).sum
    val expected = joined.groupBy(_._1).map { case (f, xs) =>
      val s = xs.map(_._3).sum
      (f, xs.map(_._2).distinct.length.toLong, xs.length.toLong, s,
        s * 10000 / total) }.toSet
    assert(expected.size == 5, "a fold is empty")
    val got = run("q_cv_folds").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_ctr_wilson ----------------------------------------------------

  test("q_ctr_wilson matches JVM fixed-sequence bound") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = ev.groupBy(_._1).map { case (et, xs) =>
      val n = xs.length.toLong
      val k = xs.count(_._2 > 200.0).toLong
      val nd = n.toDouble; val phat = k.toDouble / nd
      val lo = (phat + 3.8416 / (2.0 * nd)
        - 1.96 * math.sqrt((phat * (1.0 - phat) + 3.8416 / (4.0 * nd)) / nd)) /
        (1.0 + 3.8416 / nd)
      (et, n, k, k * 10000 / n, r4(lo)) }.toSet
    assert(expected.exists(_._3 > 0), "no conversions exercised")
    val got = run("q_ctr_wilson").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected)
  }

  // --- q_pareto --------------------------------------------------------

  test("q_pareto matches brute-force concentration report") {
    val custNat = ops.t(spark, sf, "customer")
      .select("c_custkey", "c_nationkey")
      .collect().map(r => (lng(r, 0), lng(r, 1))).toMap
    val natName = ops.t(spark, sf, "nation")
      .select("n_nationkey", "n_name")
      .collect().map(r => (lng(r, 0), r.getString(1))).toMap
    val per = orders.groupBy(o => (custNat(o._2), o._2))
      .map { case ((nk, ck), xs) => (nk, ck, xs.map(_._4).sum) }.toSeq
    val expected = per.groupBy(_._1).map { case (nk, xs) =>
      val sorted = xs.sortBy(x => (-x._3, x._2))
      val total = sorted.map(_._3).sum
      var cum = 0L; var nTop = 0L; var topCents = 0L
      for ((_, _, c) <- sorted) {
        if (cum * 5 < total * 4) { nTop += 1; topCents += c }
        cum += c
      }
      (natName(nk), xs.length.toLong, total, nTop,
        topCents * 10000 / total) }.toSet
    assert(expected.nonEmpty)
    // concentration must be non-trivial somewhere for the test to bite
    assert(expected.exists(e => e._4 < e._2))
    val got = run("q_pareto").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_benford -------------------------------------------------------

  test("q_benford matches brute-force digit audit") {
    val byStatus = orders.map(o => (o._5, o._4.toString.head.asDigit.toLong))
    val counts = byStatus.groupBy(identity)
      .map { case (k, xs) => (k, xs.length.toLong) }
    val statusTot = counts.groupBy(_._1._1)
      .map { case (s, m) => (s, m.values.sum) }
    val expected = counts.map { case ((s, d), n) =>
      (s, d, n, n * 10000 / statusTot(s)) }.toSet
    assert(expected.nonEmpty)
    val got = run("q_benford").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_seasonality ---------------------------------------------------

  test("q_seasonality matches brute-force weekday index") {
    val expected = dailyCents.groupBy(_._1._1).flatMap { case (et, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }
      val totDays = days.length.toLong
      val totCents = days.map(_._2).sum
      days.groupBy(x => (x._1 + 3) % 7).map { case (dow, xs) =>
        val n = xs.length.toLong; val c = xs.map(_._2).sum
        (et, dow, n, c, c * totDays * 10000 / (totCents * n)) }
    }.toSet
    assert(expected.nonEmpty)
    val got = run("q_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }
}
