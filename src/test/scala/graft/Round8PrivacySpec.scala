package graft

/** Round-8 §2.41 operator checks: in-JVM brute-force recomputation of
  * the l-diversity and duplicated-span audits. */
class Round8PrivacySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_ldiversity matches brute force and refines q_kanon") {
    val cust = ops.t(spark, sf, "customer")
      .selectExpr("CAST(c_nationkey AS BIGINT)", "c_mktsegment",
        "CAST(round(c_acctbal) AS BIGINT) div 1000")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = cust.groupBy(r => (r._1, r._2)).map { case ((n, m), rs) =>
      val l = rs.map(_._3).distinct.size.toLong
      (n, m, rs.length.toLong, l, l < 3)
    }.toSet
    val got = run("q_ldiversity").collect().map(r => (r.getLong(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // l can never exceed k
    assert(got.forall(r => r._4 <= r._3))
  }

  test("q_dup_spans matches a brute-force span audit") {
    val docs = ops.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ", -1)))
    val inst = docs.flatMap { case (id, src, toks) =>
      (0 to toks.length - 8).map(i =>
        (id, src, toks.slice(i, i + 8).mkString(" ")))
    }
    val nd = inst.groupBy(_._3).map { case (sp, rs) =>
      sp -> rs.map(_._1).distinct.size }
    val expected = inst.groupBy(_._2).map { case (src, rs) =>
      val dup = rs.count(r => nd(r._3) >= 2).toLong
      (src, rs.length.toLong, dup, dup * 10000 / rs.length)
    }.toSet
    val got = run("q_dup_spans").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // the fixture corpus genuinely contains cross-doc duplicated spans
    assert(got.exists(_._3 > 0))
  }
}
