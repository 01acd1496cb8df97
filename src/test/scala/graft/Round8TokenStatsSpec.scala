package graft

/** Round-8 §2.76 operator checks: token-length profile, bytes per
  * token, and prefix fan-out against in-JVM brute force. */
class Round8TokenStatsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_token_len_profile matches brute force, shares cover langs") {
    val tl = ops.t(spark, sf, "documents").select("lang", "text")
      .collect().flatMap(r => r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty).map(tk => (r.getString(0), tk.length.toLong)))
    val expected = tl.groupBy(_._1).flatMap { case (lang, rs) =>
      val tot = rs.length.toLong
      rs.groupBy(_._2).map { case (len, o) =>
        (lang, len, o.length.toLong, o.length.toLong * 10000 / tot) }
    }.toSet
    val got = run("q_token_len_profile").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_bytes_per_token matches brute force; ASCII bytes == chars") {
    val docs = ops.t(spark, sf, "documents").select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val bytes = rs.map(_._2.getBytes("UTF-8").length.toLong).sum
      val chars = rs.map(_._2.length.toLong).sum
      val toks = rs.map(_._2.split(" ", -1).length.toLong).sum
      (src, rs.length.toLong, bytes, chars, toks,
        bytes * 1000 / toks, chars * 1000 / toks)
    }.toSet
    val got = run("q_bytes_per_token").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("q_prefix_vocab fan-out grows with k and partitions the vocab") {
    val vocab = ops.t(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.nonEmpty).distinct
    val expected = (1 to 4).map { k =>
      val elig = vocab.filter(_.length >= k)
      val buckets = elig.groupBy(_.substring(0, k))
      (k.toLong, buckets.size.toLong, elig.length.toLong,
        buckets.values.map(_.length.toLong).max)
    }.toSet
    val got = run("q_prefix_vocab").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    // prefixes partition the eligible vocabulary at every k (tokens
    // shorter than k drop OUT of the eligible set, so n_prefixes is
    // NOT monotone in k — only the partition invariant holds)
    got.foreach { r => assert(r._2 <= r._3 && r._4 >= 1) }
  }
}
