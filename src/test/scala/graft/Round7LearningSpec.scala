package graft

/** Round-7 §2.26 operator checks: in-JVM brute-force recomputation of the
  * ML-adjacent batch (feature hashing, target encoding, chi-square,
  * dyadic EWMA, CUSUM, token-graph BFS, ship-latency tails, IVM merge) —
  * complementing the driver's DuckDB oracle with ground truth derived
  * from first principles on collected fixture rows. */
class Round7LearningSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Array[(Long, String, String, String)] =
    ops.t(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source")
      .collect()
      .map(r => (lng(r, 0), r.getString(1), r.getString(2), r.getString(3)))

  private lazy val dailyCents: Map[(String, Long), Long] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type", "unix_micros(ts) div 86400000000",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }

  private lazy val orderCents: Array[(Long, Long)] =
    ops.t(spark, sf, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (lng(r, 0), r.getLong(1)))

  private lazy val custSeg: Map[Long, String] =
    ops.t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
      .collect().map(r => (lng(r, 0), r.getString(1))).toMap

  // --- q_feature_hash --------------------------------------------------

  test("q_feature_hash matches JVM md5 bucket recomputation") {
    val toks = docs.flatMap { case (id, text, _, src) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => (src,
          java.lang.Long.parseLong(md5hex(t + ":fh").take(6), 16) % 16,
          id))
    }
    val expected = toks.groupBy(t => (t._1, t._2))
      .map { case ((s, b), xs) =>
        (s, b, xs.length.toLong, xs.map(_._3).distinct.length.toLong) }
      .toSet
    assert(expected.nonEmpty)
    val got = run("q_feature_hash").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_target_encode -------------------------------------------------

  test("q_target_encode matches brute-force smoothed encoding") {
    val prior = orderCents.map(_._2).sum / orderCents.length
    val expected = orderCents.groupBy(o => custSeg(o._1))
      .map { case (seg, xs) =>
        val n = xs.length.toLong; val s = xs.map(_._2).sum
        (seg, n, s, prior, (s + 10 * prior) / (n + 10)) }.toSet
    val got = run("q_target_encode").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_chisq ---------------------------------------------------------

  test("q_chisq matches brute-force contingency contributions") {
    val op = ops.t(spark, sf, "orders")
      .select("o_custkey", "o_orderpriority")
      .collect().map(r => (lng(r, 0), r.getString(1)))
    val obs = op.map { case (ck, pri) => (custSeg(ck), pri) }
      .groupBy(identity).map { case (k, xs) => (k, xs.length.toLong) }
    val rTot = obs.groupBy(_._1._1).map { case (s, xs) =>
      (s, xs.values.sum) }
    val cTot = obs.groupBy(_._1._2).map { case (p, xs) =>
      (p, xs.values.sum) }
    val nTot = obs.values.sum
    val expected = obs.map { case ((s, p), o) =>
      val diff = (o * nTot - rTot(s) * cTot(p)).toDouble
      val contrib = BigDecimal(diff * diff / rTot(s).toDouble /
        cTot(p).toDouble / nTot.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (s, p, o, rTot(s), cTot(p), nTot, contrib) }.toSet
    assert(expected.nonEmpty)
    val got = run("q_chisq").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got == expected)
  }

  // --- q_ewma ----------------------------------------------------------

  test("q_ewma matches brute-force dyadic trailing smoothing") {
    val expected = dailyCents.groupBy(_._1._1).flatMap { case (et, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      days.zipWithIndex.map { case ((d, c), i) =>
        val lags = (0 to 6).map(k =>
          if (i - k >= 0) Some(days(i - k)._2) else None)
        val num = lags.zipWithIndex.map { case (x, k) =>
          x.getOrElse(0L) * (1L << (6 - k)) }.sum
        val den = lags.zipWithIndex.map { case (x, k) =>
          if (x.isDefined) 1L << (6 - k) else 0L }.sum
        (et, d, c, num / den)
      }
    }.toSet
    assert(expected.nonEmpty)
    val got = run("q_ewma").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  // --- q_cusum ---------------------------------------------------------

  test("q_cusum matches brute-force running deviation sums") {
    val expected = dailyCents.groupBy(_._1._1).flatMap { case (et, m) =>
      val days = m.toSeq.map { case ((_, d), c) => (d, c) }.sortBy(_._1)
      val target = days.map(_._2).sum / days.length
      var acc = 0L
      days.map { case (d, c) => acc += c - target; (et, d, c, target, acc) }
    }.toSet
    assert(expected.nonEmpty)
    // deviations must be signed somewhere, or the test is vacuous
    assert(expected.exists(_._5 < 0L) || expected.exists { e =>
      e._3 < e._4 }, "no negative deviation exercised")
    val got = run("q_cusum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  // --- q_graph_bfs -----------------------------------------------------

  test("q_graph_bfs matches JVM BFS min-hop labels") {
    val docToks = docs.filter(_._3 == "en").map { case (id, text, _, _) =>
      (id, text.toLowerCase.split(" ").filter(_.nonEmpty).toSet) }
    val adj = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    for ((_, ts) <- docToks; a <- ts; b <- ts if a < b) {
      adj(a) += b; adj(b) += a
    }
    val all = docToks.flatMap(_._2).toSet
    val seed = all.min
    var hops = Map(seed -> 0L)
    var frontier = Set(seed)
    for (k <- 1 to 3) {
      frontier = frontier.flatMap(adj).diff(hops.keySet)
      hops ++= frontier.map(_ -> k.toLong)
    }
    val expected = hops.toSet
    assert(expected.size > 1, "BFS never left the seed")
    val got = run("q_graph_bfs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  // --- q_ship_latency --------------------------------------------------

  test("q_ship_latency matches brute-force rank-selected tails") {
    val ordDay = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
      .collect().map(r => (lng(r, 0), r.getLong(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber",
        "year(l_shipdate) * 100 + month(l_shipdate)",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
      .collect()
      .map(r => (lng(r, 0), lng(r, 1), lng(r, 2),
        r.getLong(3) - ordDay(lng(r, 0))))
    val expected = li.groupBy(_._3).map { case (ym, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._1, x._2)).map(_._4)
      val n = sorted.length.toLong
      val med2 = sorted(((n + 1) / 2 - 1).toInt) +
        sorted(((n + 2) / 2 - 1).toInt)
      val p90 = sorted(((n * 9 + 9) / 10 - 1).toInt)
      (ym, n, sorted.min, med2, p90, sorted.max) }.toSet
    assert(expected.nonEmpty)
    val got = run("q_ship_latency").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
  }

  // --- q_incremental_agg -----------------------------------------------

  test("q_incremental_agg merge equals full recomputation") {
    val cutDay = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .getEpochSecond * 1000000L
    val ords = ops.t(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus",
        "year(o_orderdate) * 100 + month(o_orderdate)",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect()
      .map(r => (lng(r, 0), r.getString(1), lng(r, 2), r.getLong(3),
        r.getLong(4)))
    val expected = ords.groupBy(o => (o._2, o._3)).map {
      case ((st, ym), xs) =>
        val base = xs.filter(_._4 < cutDay)
        val delta = xs.filter(_._4 >= cutDay)
        (st, ym, base.length.toLong, delta.length.toLong,
          xs.length.toLong, xs.map(_._5).sum, xs.map(_._1).max) }.toSet
    // both sides of the merge must be non-trivially populated
    assert(expected.exists(_._3 > 0) && expected.exists(_._4 > 0),
      "cutoff does not split the fixture")
    val got = run("q_incremental_agg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
  }
}
