package graft

/** Round-8 §2.46 operator checks: in-JVM brute-force recomputation of
  * the RLE and dictionary-encoding audits. */
class Round8StorageSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_rle_audit matches brute-force run counting") {
    val ev = ops.t(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val flagged = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      sorted.zipWithIndex.map { case (r, i) =>
        (r._2, i == 0 || sorted(i - 1)._2 != r._2)
      }.toSeq
    }
    val expected = flagged.groupBy(_._1).map { case (t, rs) =>
      val runs = rs.count(_._2).toLong
      (t, rs.size.toLong, runs, rs.size.toLong * 1000 / runs)
    }.toSet
    val got = run("q_rle_audit").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_dict_audit matches brute-force encoding arithmetic") {
    def profile(table: String, c: String): (String, Long, Long, Long,
        Long, Long, Long) = {
      val vs = ops.t(spark, sf, table).select(c).collect()
        .map(_.getString(0))
      val dict = vs.distinct
      val bits =
        if (dict.length <= 1) 1L
        else java.lang.Long.toBinaryString(dict.length - 1L).length.toLong
      val raw = vs.map(_.length.toLong).sum
      val db = dict.map(_.length.toLong).sum
      (c, vs.length.toLong, dict.length.toLong, bits, raw, db,
        db + (vs.length * bits + 7) / 8)
    }
    val expected = Set(profile("lineitem", "l_returnflag"),
      profile("lineitem", "l_linestatus"),
      profile("orders", "o_orderstatus"),
      profile("orders", "o_orderpriority"))
    val got = run("q_dict_audit").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // dictionary encoding must actually win on these columns
    assert(got.forall(r => r._7 < r._5))
  }
}
