package graft

/** Round-8 §2.60 operator checks: duplicate-cluster profile, embedding
  * variance, and order-size profile against in-JVM brute force. */
class Round8ProfilesSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_dup_profile partitions the corpus exactly") {
    val texts = ops.t(spark, sf, "documents").select("text")
      .collect().map(_.getString(0))
    val n = texts.length.toLong
    val expected = texts.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (k, cs) =>
        val nc = cs.size.toLong
        (k, nc, k * nc, (k - 1) * nc, k * nc * 10000 / n)
      }.toSet
    val got = run("q_dup_profile").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // docs column partitions the corpus
    assert(got.toSeq.map(_._3).sum == n)
  }

  test("q_embed_variance matches brute-force quantized moments") {
    val embs = ops.t(spark, sf, "embeddings").select("embedding")
      .collect().map(_.getSeq[Float](0))
    val expected = (1 to 64).map { pos =>
      val xs = embs.map(e => math.round(e(pos - 1).toDouble * 10000))
      val n = xs.length.toLong
      val su = xs.sum
      val qu = xs.map(x => x * x).sum
      (pos.toLong, n, su, qu,
        ((BigInt(n) * qu - BigInt(su) * su) / (BigInt(n) * n)).toLong)
    }.toSet
    val got = run("q_embed_variance").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
    // variances are non-negative and some dimension actually varies
    assert(got.forall(_._5 >= 0) && got.exists(_._5 > 0))
  }

  test("q_order_profile covers all orders and shares sum to ~100%") {
    val li = ops.t(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val per = li.groupBy(_._1).toSeq.map { case (_, rs) =>
      (rs.length.toLong, rs.map(_._2).sum) }
    val tot = per.map(_._2).sum
    val expected = per.groupBy(_._1).map { case (k, os) =>
      (k, os.length.toLong, os.map(_._2).sum,
        os.map(_._2).sum * 10000 / tot)
    }.toSet
    val got = run("q_order_profile").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    val bpSum = got.toSeq.map(_._4).sum
    assert(bpSum <= 10000 && bpSum > 10000 - got.size)
  }
}
