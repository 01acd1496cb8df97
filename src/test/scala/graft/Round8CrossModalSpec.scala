package graft

/** Round-8 §2.72 operator checks: embedding coverage, length↔norm
  * correlation, and class-conditional norms against in-JVM brute
  * force. */
class Round8CrossModalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def normU(e: Seq[Float]): Long = {
    val sq = e.map(v => {
      val u = math.round(v.toDouble * 10000); u * u
    }).sum
    math.round(math.sqrt(sq.toDouble))
  }

  test("q_embed_coverage matches brute force and bounds hold") {
    val ids = ops.t(spark, sf, "embeddings").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val docs = ops.t(spark, sf, "documents").select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val n = rs.length.toLong
      val e = rs.count(r => ids.contains(r._2)).toLong
      (src, n, e, e * 10000 / n)
    }.toSet
    val got = run("q_embed_coverage").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(r => r._3 <= r._2 && r._4 <= 10000))
  }

  test("q_len_norm_corr matches brute force and is bounded") {
    val nu = ops.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), normU(r.getSeq[Float](1)))).toMap
    val j = ops.t(spark, sf, "documents").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(r => nu.contains(r._1))
      .map(r => (r._2, nu(r._1)))
    val n = j.length.toLong
    val (sx, sy) = (j.map(_._1).sum, j.map(_._2).sum)
    val qx = j.map(r => r._1 * r._1).sum
    val qy = j.map(r => r._2 * r._2).sum
    val sxy = j.map(r => r._1 * r._2).sum
    val (dx, dy) = (n * qx - sx * sx, n * qy - sy * sy)
    val expected: Any = if (dx == 0 || dy == 0) null
    else math.round((n * sxy - sx * sy).toDouble * 1000 /
      math.sqrt(dx.toDouble * dy.toDouble))
    val r = run("q_len_norm_corr").collect().head
    assert(r.getLong(0) == n)
    val got: Any = if (r.isNullAt(1)) null else r.getLong(1)
    assert(got == expected)
    if (got != null)
      assert(math.abs(got.asInstanceOf[Long]) <= 1000)
  }

  test("q_norm_by_label matches brute-force moments") {
    val vs = ops.t(spark, sf, "embeddings")
      .selectExpr("CAST(label AS BIGINT)", "embedding").collect()
      .map(r => (r.getLong(0), normU(r.getSeq[Float](1))))
    val expected = vs.groupBy(_._1).map { case (l, rs) =>
      val n = rs.length.toLong
      val su = rs.map(_._2).sum
      val qu = rs.map(r => r._2 * r._2).sum
      (l, n, su * 1000 / n,
        ((BigInt(n) * qu - BigInt(su) * su) / (BigInt(n) * n)).toLong)
    }.toSet
    val got = run("q_norm_by_label").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    assert(got.forall(_._4 >= 0))
  }
}
