package graft

/** Round-8 §2.65 operator checks: MDE/power, Cohen's d, and variance
  * ratio against in-JVM brute force on the same pre/post moments. */
class Round8PowerSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (n1, n2, s1, s2, q1, q2) per type. */
  private def moments: Map[String, (Long, Long, Long, Long, Long, Long)] =
    ops.t(spark, sf, "events")
      .selectExpr("event_type",
        "CAST(ts < TIMESTAMP '2024-01-16 00:00:00' AS BOOLEAN)",
        "CAST(round(value * 100) AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      .groupBy(_._1).map { case (ty, rs) =>
        val (pre, post) = rs.partition(_._2)
        ty -> (pre.length.toLong, post.length.toLong,
          pre.map(_._3).sum, post.map(_._3).sum,
          pre.map(r => r._3 * r._3).sum, post.map(r => r._3 * r._3).sum)
      }

  test("q_power_mde matches brute force and scales with 1/sqrt(n)") {
    val expected = moments.map { case (ty, (n1, n2, s1, s2, q1, q2)) =>
      val n = n1 + n2
      val sd = math.round(math.sqrt(
        ((q1 + q2).toDouble * n - (s1 + s2).toDouble * (s1 + s2)) /
          (n.toDouble * n)) * 1000)
      val mde = math.round(28016 * sd.toDouble / 10000 *
        math.sqrt(2.0 / math.min(n1, n2)))
      val reqN: Any = if (s1 + s2 == 0) null
      else math.ceil(2.0 * math.pow(28016.0 / 10000 * sd /
        (0.05 * ((s1 + s2).toDouble * 1000 / n)), 2)).toLong
      (ty, n1, n2, sd, mde, reqN)
    }.toSet
    val got = run("q_power_mde").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) null else r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // MDE positive wherever there is any variance
    assert(got.forall(r => r._5 >= 0))
  }

  test("q_cohens_d matches brute force") {
    val expected = moments.map { case (ty, (n1, n2, s1, s2, q1, q2)) =>
      val d: Any = if (n1 < 2 || n2 < 2) null
      else math.round((s2.toDouble / n2 - s1.toDouble / n1) * 1000 /
        math.sqrt(((q1.toDouble - s1.toDouble * s1 / n1) +
          (q2.toDouble - s2.toDouble * s2 / n2)) / (n1 + n2 - 2)))
      (ty, n1, n2, d)
    }.toSet
    val got = run("q_cohens_d").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_variance_ratio matches brute force and is positive") {
    val expected = moments.map { case (ty, (n1, n2, s1, s2, q1, q2)) =>
      val v1 = q1.toDouble - s1.toDouble * s1 / n1
      val r: Any = if (n1 < 2 || n2 < 2 || v1 == 0.0) null
      else math.round(((q2.toDouble - s2.toDouble * s2 / n2) / (n2 - 1))
        * 1000 / (v1 / (n1 - 1)))
      (ty, n1, n2, r)
    }.toSet
    val got = run("q_variance_ratio").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    got.foreach { r =>
      if (r._4 != null) assert(r._4.asInstanceOf[Long] > 0)
    }
  }
}
