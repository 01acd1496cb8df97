package graft

/** Round-8 §2.34 operator checks: in-JVM brute-force recomputation of
  * the corpus-statistics batch (collocation LLR, Zipf slope, RAKE
  * keywords, DSIR weights, LSH recall audit, burstiness) from collected
  * fixture rows — complementing the driver's DuckDB oracle. */
class Round8CorpusStatsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Raw token arrays of the en corpus, by doc_id. */
  private lazy val enToks: Array[(Long, Array[String])] =
    ops.t(spark, sf, "documents").filter("lang = 'en'")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ", -1)))

  private lazy val bigrams: Array[(Long, String, String)] =
    enToks.flatMap { case (id, ts) =>
      ts.toSeq.sliding(2).collect { case Seq(a, b) => (id, a, b) } }

  /** Spark round(x, 4) twin. */
  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def rnd(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  test("q_collocation_llr matches the brute-force Dunning statistic") {
    val n = bigrams.length.toLong
    val pc = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) =>
      k -> v.length.toLong }
    val ca = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val cb = bigrams.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    def term(k: Long, r: Long, c: Long): Double =
      if (k > 0) k.toDouble * math.log(k.toDouble * n / (r.toDouble * c))
      else 0.0
    val expected = pc.collect { case ((a, b), k11) if k11 >= 5 =>
      val (ra, rb) = (ca(a), cb(b))
      val (k12, k21, k22) = (ra - k11, rb - k11, n - ra - rb + k11)
      (a, b, k11, r4(2 * (term(k11, ra, rb) + term(k12, ra, n - rb) +
        term(k21, n - ra, rb) + term(k22, n - ra, n - rb))))
    }.toSet
    assert(expected.size > 50 && expected.exists(_._4 > 10))
    val got = run("q_collocation_llr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("q_zipf matches the exact-quantized OLS fit") {
    val all = ops.t(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase.split(" ", -1)))
    val expected = all.groupBy(_._1).map { case (src, docs) =>
      val cnt = docs.flatMap(_._2).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val q = top.zipWithIndex.map { case ((_, c), i) =>
        (rnd(math.log(i + 1.0) * 1e6), rnd(math.log(c.toDouble) * 1e6)) }
      val nf = q.length.toLong
      val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
      val sxy = q.map(p => p._1 * p._2).sum
      val sxx = q.map(p => p._1 * p._1).sum
      val slope = (nf * sxy - sx * sy).toDouble / (nf * sxx - sx * sx)
      val icept = (sy.toDouble / nf - slope * (sx.toDouble / nf)) / 1e6
      (src, nf, r4(slope), r4(icept))
    }.toSet
    assert(expected.forall(_._3 < 0)) // Zipf: frequency falls with rank
    val got = run("q_zipf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("q_keyword_rake matches brute-force degree/frequency") {
    val occ = enToks.flatMap { case (id, ts) =>
      ts.filter(_.nonEmpty).map(t => (id, t)) }
    val freq = occ.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val dset = occ.distinct
    val ndist = dset.groupBy(_._1).map { case (d, v) => d -> v.length.toLong }
    val expected = dset.groupBy(_._2).map { case (t, v) =>
      val deg = v.map(p => ndist(p._1) - 1).sum
      (t, v.length.toLong, freq(t), deg, deg * 10000 / freq(t))
    }.toSet
    val got = run("q_keyword_rake").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
  }

  test("q_dsir matches the brute-force smoothed bigram LLR weights") {
    val nc = bigrams.length.toLong
    val nt = bigrams.count(_._1 % 4 == 0).toLong
    val lm = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) =>
      k -> (v.length.toLong, v.count(_._1 % 4 == 0).toLong) }
    val v = lm.size.toLong
    val lw = lm.map { case (k, (cc, ct)) =>
      k -> rnd(math.log(((ct + 1) * (nc + v)).toDouble /
        ((cc + 1) * (nt + v)).toDouble) * 1e6) }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      (id, bs.length.toLong, bs.map(b => lw((b._2, b._3))).sum) }.toSet
    // target docs must score higher on average than the rest
    val tAvg = expected.filter(_._1 % 4 == 0).map(_._3).sum /
      expected.count(_._1 % 4 == 0)
    val oAvg = expected.filter(_._1 % 4 != 0).map(_._3).sum /
      expected.count(_._1 % 4 != 0)
    assert(tAvg > oAvg)
    val got = run("q_dsir").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("q_lsh_recall matches brute-force truth and candidate sets") {
    val sets = enToks.map { case (id, ts) =>
      (id, ts.filter(_.nonEmpty).toSet) }
    val truth = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa intersect sb).size.toLong
      if 3 * c >= sa.size + sb.size
    } yield (a, b)).toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sigs = sets.map { case (id, toks) =>
      id -> Array.tabulate(16)(j =>
        toks.map(t => md5hex(s"$j:$t").substring(0, 15)).min)
    }.toMap
    val cand = (for {
      (a, _) <- sets; (b, _) <- sets if a < b
      if (0 until 8).exists(band =>
        sigs(a)(2 * band) == sigs(b)(2 * band) &&
          sigs(a)(2 * band + 1) == sigs(b)(2 * band + 1))
    } yield (a, b)).toSet
    val tp = (truth intersect cand).size.toLong
    val expected = (truth.size.toLong, cand.size.toLong, tp,
      if (cand.nonEmpty) tp * 10000 / cand.size else 0L,
      if (truth.nonEmpty) tp * 10000 / truth.size else 0L)
    assert(expected._1 > 0 && expected._5 > 5000,
      "LSH at 8 bands × 2 rows should recall most J≥0.5 pairs")
    val got = run("q_lsh_recall").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).head
    assert(got == expected)
  }

  test("q_burstiness matches the exact variance-to-mean ratio") {
    val n = enToks.length.toLong
    val perDoc = enToks.flatMap { case (id, ts) =>
      ts.filter(_.nonEmpty).groupBy(identity)
        .map { case (t, v) => (t, id, v.length.toLong) } }
    val expected = perDoc.groupBy(_._1).map { case (t, v) =>
      val total = v.map(_._3).sum
      val s2 = v.map(x => x._3 * x._3).sum
      (t, v.length.toLong, total, (n * s2 - total * total) * 10000 /
        (n * total))
    }.toSet
    assert(expected.exists(_._4 > 10000)) // some token is over-dispersed
    val got = run("q_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }
}
