package graft

/** Round-8 §2.48 operator checks: in-JVM brute-force recomputation of
  * the filter funnel, dedup cascade, and bigram entropy. */
class Round8CurationSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(String, String, Long)] =
    ops.t(spark, sf, "documents").select("source", "text", "n_chars")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  test("q_filter_funnel matches brute-force gate accounting") {
    val stops = Set("the", "a", "of", "and", "to", "in", "is", "for")
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val gates = rs.map { case (_, text, nChars) =>
        val toks = text.toLowerCase.split(" ", -1)
        val nToks = toks.length.toLong
        val nDist = toks.distinct.length.toLong
        val tokChars = nChars - (nToks - 1)
        val nStop = stops.count(w => toks.contains(w)).toLong
        (nToks >= 50 && nToks <= 100000,
          tokChars >= nToks * 3 && tokChars <= nToks * 10,
          nDist * 10 >= nToks * 3, nStop >= 2)
      }
      (src, rs.length.toLong, gates.count(_._1).toLong,
        gates.count(_._2).toLong, gates.count(_._3).toLong,
        gates.count(_._4).toLong,
        gates.count(g => g._1 && g._2 && g._3 && g._4).toLong)
    }.toSet
    val got = run("q_filter_funnel").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).toSet
    assert(got == expected && expected.nonEmpty)
    // funnel sanity: pass_all can never exceed any single gate
    assert(got.forall(r => r._7 <= Seq(r._3, r._4, r._5, r._6).min))
  }

  test("q_dedup_cascade matches brute-force stage counts") {
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val n = rs.length.toLong
      val nExact = rs.map(_._2).distinct.length.toLong
      val nPrefix = rs.map(_._2.toLowerCase.split(" ", -1).take(8)
        .mkString(" ")).distinct.length.toLong
      (src, n, nExact, nPrefix, (n - nExact) * 10000 / n,
        (nExact - nPrefix) * 10000 / nExact)
    }.toSet
    val got = run("q_dedup_cascade").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))).toSet
    assert(got == expected && expected.nonEmpty)
    // cascade is monotone: n_docs >= n_exact >= n_prefix
    assert(got.forall(r => r._2 >= r._3 && r._3 >= r._4))
  }

  test("q_bigram_entropy matches brute-force conditional entropy") {
    def lnu(x: Double): Long =
      java.math.BigDecimal.valueOf(math.log(x) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val expected = docs.groupBy(_._1).map { case (src, rs) =>
      val bigrams = rs.flatMap { case (_, text, _) =>
        val toks = text.toLowerCase.split(" ", -1)
        toks.zip(toks.drop(1))
      }
      val nAb = bigrams.groupBy(identity).map { case (k, o) =>
        k -> o.length.toLong }
      val nA = nAb.toSeq.groupBy(_._1._1).map { case (a, o) =>
        a -> o.map(_._2).sum }
      val n = bigrams.length.toLong
      val hSum = nAb.map { case ((a, _), c) =>
        c * lnu(nA(a).toDouble / c) }.sum
      (src, n, nAb.size.toLong, hSum, hSum / n)
    }.toSet
    val got = run("q_bigram_entropy").collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // conditional entropy is nonnegative
    assert(got.forall(_._5 >= 0))
  }
}
