package graft

/** Round-8 §2.64 operator checks: centroid shift, PQ distortion, and
  * dimension correlation against in-JVM brute force. */
class Round8EmbedAuditSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def vecs: Array[(Long, Int, Array[Long])] =
    ops.t(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(v =>
          math.round(v.toDouble * 10000)).toArray))

  test("q_centroid_shift matches brute force and sits near 1") {
    val vs = vecs
    val expected = vs.groupBy(_._2).map { case (label, rs) =>
      val (ev, od) = rs.partition(_._1 % 2 == 0)
      def cv(part: Array[(Long, Int, Array[Long])]): Array[Double] =
        (0 until 64).map(i =>
          part.map(_._3(i)).sum.toDouble / part.length).toArray
      val (ca, cb) = (cv(ev), cv(od))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until 64).foreach { k =>
        dot += ca(k) * cb(k); na += ca(k) * ca(k); nb += cb(k) * cb(k)
      }
      (label.toLong, ev.length.toLong, od.length.toLong,
        math.round(dot / math.sqrt(na * nb) * 10000))
    }.toSet
    val got = run("q_centroid_shift").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && expected.nonEmpty)
    // cosine bound (±1 in ×10⁴ units, ±1 quantization slack); at this
    // fixture size half-centroids of ~10 random vectors can sit
    // anywhere in the band — the statistic, not its magnitude, is
    // what's under test.
    assert(got.forall(r => math.abs(r._4) <= 10001))
  }

  test("q_pq_distortion matches the exact snap-error profile") {
    val vs = vecs
    val errs = vs.flatMap(_._3.zipWithIndex.map { case (xu, p) =>
      val qu = ((xu + 500500) / 1000) * 1000 - 500000
      (p / 8 + 1L, xu - qu)
    })
    val expected = errs.groupBy(_._1).map { case (ss, rs) =>
      val sse = rs.map(e => e._2 * e._2).sum
      (ss, rs.length.toLong, sse, sse / rs.length,
        rs.map(e => math.abs(e._2)).max)
    }.toSet
    val got = run("q_pq_distortion").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && expected.nonEmpty)
    // snap error is bounded by half the grid step
    assert(got.forall(_._5 <= 500))
  }

  test("q_dim_corr matches the brute-force top-10 by |r|") {
    val vs = vecs
    val n = vs.length.toLong
    val scored = for (i <- 0 until 63; j <- i + 1 until 64) yield {
      val (sx, sy) = (vs.map(_._3(i)).sum, vs.map(_._3(j)).sum)
      val qx = vs.map(v => v._3(i) * v._3(i)).sum
      val qy = vs.map(v => v._3(j) * v._3(j)).sum
      val sxy = vs.map(v => v._3(i) * v._3(j)).sum
      val (dx, dy) = (n * qx - sx * sx, n * qy - sy * sy)
      val r = math.round((n * sxy - sx * sy).toDouble * 1000 /
        math.sqrt(dx.toDouble * dy.toDouble))
      (i + 1L, j + 1L, n, r, dx != 0 && dy != 0)
    }
    val expected = scored.filter(_._5)
      .sortBy(t => (-math.abs(t._4), t._1, t._2)).take(10)
      .map(t => (t._1, t._2, t._3, t._4)).toSet
    val got = run("q_dim_corr").collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected && got.size == 10)
    // correlations are bounded
    assert(got.forall(r => math.abs(r._4) <= 1000))
  }
}
