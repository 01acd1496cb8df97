package graft

/** Round-8 §2.38 operator checks: in-JVM brute-force recomputation of
  * the weighted/robust BI + leakage-audit batch. */
class Round8RobustSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def lnu(x: Double, scale: Long): Long =
    java.math.BigDecimal.valueOf(math.log(x) * scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("q_weighted_median matches the brute-force weighted middle") {
    val rows = ops.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT)",
        "CAST(get_json_object(props, '$.k') AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val totW = rs.map(_._3).sum
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= totW }.get._2
      (t, rs.length.toLong, totW, med)
    }.toSet
    val got = run("q_weighted_median").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // the weighted median must differ from nothing structural: it lies
    // inside each type's value range
    expected.foreach { case (t, _, _, m) =>
      val vs = rows.filter(_._1 == t).map(_._2)
      assert(m >= vs.min && m <= vs.max) }
  }

  test("q_theil_index matches brute-force decomposition") {
    val spend = ops.t(spark, sf, "orders")
      .join(ops.t(spark, sf, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(c => (c._1, c._2)).toSeq
      .map { case ((_, nk), rs) => (nk, rs.map(_._3).sum) }
    val n = spend.length.toLong
    val xt = spend.map(_._2).sum
    val expected = spend.groupBy(_._1).map { case (nk, rs) =>
      val ng = rs.length.toLong
      val xg = rs.map(_._2).sum
      val wsum = rs.map { case (_, x) =>
        x * lnu(x.toDouble * ng / xg, 1000000L) }.sum
      val between = xg * lnu(xg.toDouble * n / (xt.toDouble * ng),
        1000000L) / xt
      (nk.toLong, ng, xg, wsum / xg, between)
    }.toSet
    val got = run("q_theil_index").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // within-group Theil is non-negative up to quantization slack
    got.foreach { case (nk, _, _, w, _) =>
      assert(w >= -5, s"nation $nk: within Theil $w < 0") }
  }

  test("q_price_elasticity matches brute-force quantized OLS") {
    val parts = ops.t(spark, sf, "part").selectExpr("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice")
      .collect().map(r => (parts(r.getLong(0)),
        lnu(r.getDouble(1), 1000L),
        lnu(r.getDouble(2) / r.getDouble(1), 1000L)))
    val expected = li.groupBy(_._1).map { case (b, rs) =>
      val nn = rs.length.toLong
      val sx = rs.map(_._3).sum; val sy = rs.map(_._2).sum
      val sxx = rs.map(r => r._3 * r._3).sum
      val sxy = rs.map(r => r._3 * r._2).sum
      (b, nn, (nn * sxy - sx * sy) * 1000 / (nn * sxx - sx * sx))
    }.toSet
    val got = run("q_price_elasticity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q_source_overlap matches brute-force line-set intersections") {
    val docs = ops.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split(" ", -1)))
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, toks) =>
        (0 to (toks.length - 1) / 5).map(i =>
          toks.slice(i * 5, i * 5 + 5).mkString(" "))
      }.toSet
    }
    val srcs = bySrc.keys.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
      shared = bySrc(a).intersect(bySrc(b)).size.toLong if shared > 0
      na = bySrc(a).size.toLong; nb = bySrc(b).size.toLong
    } yield (a, b, na, nb, shared,
      shared * 10000 / (na + nb - shared))).toSet
    val got = run("q_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_lsh_recall sampling gate estimates the full-corpus audit") {
    val full = run("q_lsh_recall").collect().head
    spark.conf.set("spark.graft.lshRecallSampleMod", "2")
    try {
      val half = run("q_lsh_recall").collect().head
      // the sampled audit runs on fewer pairs but still measures THIS
      // banding: recall_bp stays in the same regime (both sides nonzero,
      // within 3000 bp of the full audit on the fixture)
      assert(half.getLong(0) < full.getLong(0))
      assert(math.abs(half.getLong(4) - full.getLong(4)) <= 3000,
        s"sampled recall ${half.getLong(4)} vs full ${full.getLong(4)}")
    } finally spark.conf.unset("spark.graft.lshRecallSampleMod")
  }
}
