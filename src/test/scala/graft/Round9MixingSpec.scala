package graft

/** §2.91 data-mixing batch: in-memory recount of the temperature
  * weights, entropy fold, and epoch plan at sf0.001. */
class Round9MixingSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val srcTok: Map[String, (Long, Long)] =
    ops.t(spark, sf, "documents")
      .selectExpr("source", "size(split(lower(text), ' '))")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).map { case (s, rs) =>
        s -> (rs.size.toLong, rs.map(_._2).sum)
      }

  private def wU(n: Long, tauMilli: Int): Long =
    math.round(math.exp(math.log(n.toDouble) * tauMilli / 1000.0) * 1000)

  test("q_temperature_mix matches in-memory weight arithmetic") {
    val want = (for {
      tau <- Seq(500, 700, 1000)
      tot = srcTok.values.map(v => wU(v._2, tau)).sum
      (src, (nd, nt)) <- srcTok
    } yield (tau.toLong, src) ->
      (nd, nt, wU(nt, tau), wU(nt, tau) * 10000 / tot)).toMap
    val got = run("q_temperature_mix").collect().map(r =>
      (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want,
      s"diff ${(got.toSet diff want.toSet).take(3)} vs " +
        s"${(want.toSet diff got.toSet).take(3)}")
    // lower temperature flattens the mix: the biggest source's share
    // must shrink as tau drops
    val top = srcTok.maxBy(_._2._2)._1
    assert(got((500L, top))._4 < got((1000L, top))._4)
  }

  test("q_mix_entropy matches the quantized entropy fold") {
    val want = Seq(500, 700, 1000).map { tau =>
      val tot = srcTok.values.map(v => wU(v._2, tau)).sum
      val terms = srcTok.values.map { v =>
        val bp = wU(v._2, tau) * 10000 / tot
        if (bp == 0) 0L
        else bp * -math.round(math.log(bp.toDouble / 10000.0) * 1e6)
      }
      tau.toLong -> (srcTok.size.toLong, terms.sum / 10000)
    }.toMap
    val got = run("q_mix_entropy").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"$got vs $want")
    // diversity: entropy non-increasing in tau
    assert(got(500L)._2 >= got(1000L)._2)
  }

  test("q_epoch_plan: allocation sums within rounding, epochs coherent") {
    val got = run("q_epoch_plan").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == srcTok.keySet)
    val tot = srcTok.values.map(v => wU(v._2, 700)).sum
    for ((src, (nt, w, alloc, em)) <- got) {
      assert(nt == srcTok(src)._2)
      assert(w == wU(nt, 700))
      assert(alloc == (BigInt(1000000) * w / tot).toLong)
      assert(em == alloc * 1000 / nt)
    }
    // allocations sum to the budget up to one-unit-per-source floor loss
    val allocSum = got.values.map(_._3).sum
    assert(allocSum <= 1000000L && allocSum > 1000000L - got.size)
    // the sub-linear weighting's point: epochs fall monotonically with
    // source size (small sources repeat more) — budget-independent
    val byTok = got.values.toSeq.sortBy(_._1).map(_._4)
    assert(byTok.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      s"epochs not monotone in size: $byTok")
    assert(byTok.head > byTok.last, "weighting flat — vacuous")
  }
}
