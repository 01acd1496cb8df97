package graft

/** §2.88 batch: brute-force twins at sf0.001 — threshold sweep recount,
  * log-loss/Brier arithmetic from an in-memory md5-sign fold, and a
  * direct top-10 overlap recomputation. */
class Round9EvalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def signs(j: Int): Array[Float] = Array.tabulate(64) { i =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(String.valueOf(j * 64 + i).getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1.0f else -1.0f
  }

  private lazy val emb: Seq[(Long, Array[Float], Long)] =
    ops.t(spark, sf, "embeddings")
      .selectExpr("CAST(vec_id AS BIGINT)", "embedding",
        "CAST(label AS BIGINT)")
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2))
      }

  private def score(v: Array[Float], sg: Array[Float]): Long = {
    var acc = 0.0
    var i = 0
    while (i < 64) { acc += v(i).toDouble * sg(i); i += 1 }
    math.round(acc * 10000)
  }

  test("q_pr_curve matches a threshold-sweep recount") {
    val sg = signs(100)
    val sc = emb.map(e => (score(e._2, sg), if (e._3 >= 5) 1L else 0L))
    val nPos = sc.map(_._2).sum
    val want = Seq(-20000L, -15000L, -10000L, -5000L, 0L, 5000L, 10000L,
      15000L, 20000L).map { t =>
      val pred = sc.filter(_._1 >= t)
      val tp = pred.map(_._2).sum
      t -> (pred.size.toLong, tp, nPos,
        if (pred.isEmpty) None else Some(tp * 10000 / pred.size),
        tp * 10000 / nPos,
        Some(2 * tp * 10000 / (pred.size + nPos)))
    }.toMap
    val got = run("q_pr_curve").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    assert(got == want, s"$got vs $want")
    // sweep discriminates: recall strictly falls across the range
    assert(got(-20000L)._5 > got(20000L)._5)
  }

  test("q_log_loss matches in-memory cross-entropy and Brier") {
    val want = (100 to 102).map { j =>
      val sg = signs(j)
      val rows = emb.map { e =>
        val su = score(e._2, sg)
        val pos = if (e._3 >= 5) 1L else 0L
        val p = math.min(math.max((su + 10000) / 20, 1L), 999L)
        val inLog = if (pos == 1) p else 1000 - p
        val loss = -math.round(math.log(inLog.toDouble / 1000.0) * 1e6)
        val brier = (p - pos * 1000) * (p - pos * 1000)
        (loss, brier)
      }
      val n = rows.size.toLong
      (j - 100).toLong ->
        (n, rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    }.toMap
    val got = run("q_log_loss").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"$got vs $want")
    // a clamped-affine "probability" is a weak calibrator, but loss must
    // stay finite and Brier within [0, 10^6]
    assert(got.values.forall(v => v._3 >= 0 && v._3 <= 1000000))
  }

  test("q_rank_overlap matches direct top-10 set intersection") {
    val probes = emb.filter(_._1 < 50)
    def norm2(v: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i); i += 1 }; acc
    }
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i); i += 1 }; acc
    }
    val want = probes.map { case (pid, pe, _) =>
      val others = emb.filter(_._1 != pid)
      val scored = others.map { case (nid, e, _) =>
        val cosF = dotd(pe, e) / math.sqrt(norm2(pe) * norm2(e))
        val pe32 = pe.take(32); val e32 = e.take(32)
        val cosT = dotd(pe32, e32) / math.sqrt(norm2(pe32) * norm2(e32))
        (nid, cosF, cosT)
      }
      val topC = scored.sortBy(x => (-x._2, x._1)).take(10)
        .map(_._1).toSet
      val topD = scored.sortBy(x => (-x._3, x._1)).take(10)
        .map(_._1).toSet
      val ov = (topC intersect topD).size.toLong
      pid -> (ov, ov * 10000 / (20 - ov))
    }.toMap
    val got = run("q_rank_overlap").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet).take(3)}")
    // truncation must matter for SOME probe (else the audit is moot)
    assert(got.values.exists(_._1 < 10))
  }
}
