package graft

import java.security.MessageDigest

/** Round-8 §2.54 operator checks: estimator audits against in-JVM
  * brute force with a real MD5. */
class Round8EstimatorSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_ht_estimate matches brute force; sampling error is bounded") {
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "l_orderkey", "l_linenumber",
        "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3)))
    val expected = li.groupBy(_._1).map { case (f, rs) =>
      val sampled = rs.filter(r => md5hex(s"${r._2}-${r._3}").head == '0')
      val tot = rs.map(_._4).sum
      val ht = sampled.map(_._4).sum * 16
      (f, rs.length.toLong, tot, sampled.length.toLong, ht,
        math.abs(ht - tot) * 10000 / tot)
    }.toSet
    val got = run("q_ht_estimate").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // a 1/16 uniform sample of thousands of rows lands within ~25%
    assert(got.forall(_._6 < 2500))
  }

  test("q_capture_recapture matches brute force; estimate is sane") {
    val ev = ops.t(spark, sf, "events").selectExpr("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).distinct
    val expected = ev.groupBy(_._1).map { case (t, rs) =>
      val users = rs.map(_._2)
      def in(salt: String, u: Long): Boolean =
        "0123".contains(md5hex(s"$u:$salt").head)
      val a = users.filter(in("cra", _)).toSet
      val b = users.filter(in("crb", _)).toSet
      val m = a.intersect(b).size.toLong
      val est = if (m == 0) None
        else Some(a.size.toLong * b.size.toLong / m)
      (t, users.length.toLong, a.size.toLong, b.size.toLong, m, est,
        est.map(e => math.abs(e - users.length.toLong) * 10000 /
          users.length.toLong))
    }.toSet
    val got = run("q_capture_recapture").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))
    }.toSet
    assert(got == expected && expected.nonEmpty)
  }
}
