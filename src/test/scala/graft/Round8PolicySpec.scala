package graft

/** Round-8 §2.80 operator checks: representative choice, split
  * balance, and filter overlap against in-JVM brute force. */
class Round8PolicySpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_rep_choice matches brute force over duplicate clusters") {
    val docs = ops.t(spark, sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val clusters = docs.groupBy(_._2).values.filter(_.length >= 2).toSeq
    val r = run("q_rep_choice").collect().head
    assert(r.getLong(0) == clusters.length.toLong)
    if (clusters.isEmpty) {
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    } else {
      val differ = clusters.count { c =>
        val first = c.map(_._1).min
        val longest = c.sortBy(d => (-d._3, d._1)).head._1
        first != longest
      }.toLong
      assert(r.getLong(1) == clusters.map(_.length.toLong).sum)
      assert(r.getLong(2) == differ)
      assert(r.getLong(3) == differ * 10000 / clusters.length)
    }
  }

  test("q_split_balance matches brute force and splits partition") {
    def split(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:split".getBytes("UTF-8"))
      val h2 = "%02x".format(d(0))
      if (h2 < "1a") "val" else if (h2 < "34") "test" else "train"
    }
    val docs = ops.t(spark, sf, "documents").select("doc_id", "lang")
      .collect().map(r => (split(r.getLong(0)), r.getString(1)))
    val nn = docs.length.toLong
    val splitTot = docs.groupBy(_._1).map { case (k, o) =>
      k -> o.length.toLong }
    val corpus = docs.groupBy(_._2).map { case (k, o) =>
      k -> o.length.toLong }
    val expected = docs.groupBy(identity).map { case ((sp, lg), o) =>
      val n = o.length.toLong
      val share = n * 10000 / splitTot(sp)
      val cbp = corpus(lg) * 10000 / nn
      (sp, lg, n, share, cbp, share - cbp)
    }.toSet
    val got = run("q_split_balance").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.toSeq.map(_._3).sum == nn)
  }

  test("q_filter_overlap Jaccard bounds and symmetry of the 6 pairs") {
    val rows = run("q_filter_overlap").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (ra, rb, both) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(ra, rb))
      if (!r.isNullAt(5)) {
        val j = r.getLong(5)
        assert(j >= 0 && j <= 10000)
      }
    }
    // each named filter appears in exactly 3 pairs
    val names = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
    assert(names.groupBy(identity).values.forall(_.length == 3))
  }
}
